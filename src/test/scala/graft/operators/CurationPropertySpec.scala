package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Randomized INVARIANT checks for the round-6 curation additions —
  * each property is checked against an independent recomputation from
  * the raw fixture, not against the operator's own building blocks. */
class CurationPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  private def randomCorpus(nDocs: Int, vocab: Int, maxLines: Int): Seq[(Long, String)] =
    (1 to nDocs).map { i =>
      val lines = (0 until 1 + rnd.nextInt(maxLines)).map { _ =>
        (0 until 1 + rnd.nextInt(6)).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
      }
      (i.toLong, lines.mkString("\n"))
    }

  test("dedupLines property: survivors are exactly the non-boilerplate lines, in order") {
    (1 to 3).foreach { round =>
      val docs = randomCorpus(60, 12, 5) // small vocab → real line collisions
      val minDocs = 2 + round
      // independent recomputation
      val docLines = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }.toMap
      val boiler = docLines.toSeq
        .flatMap { case (id, ls) => ls.map(_.trim).filter(_.nonEmpty).distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= minDocs).keySet
      val expected = docLines.view.mapValues(_.filterNot(l => boiler(l.trim)))
        .filter(_._2.nonEmpty)
        .mapValues(ls => (ls.mkString("\n"), ls.length.toLong)).toMap
      val got = Dedup.dedupLines(docs.toDF("doc_id", "text"), "text", "doc_id", minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got == expected, s"round $round minDocs $minDocs")
    }
  }

  test("heavyHitters property: equals brute force at random thresholds") {
    (1 to 3).foreach { round =>
      // zipf-ish: token w_k drawn with weight ~ 1/(k+1)
      val vocab = 30
      val docs = (1 to 80).map { i =>
        val toks = (0 until 5 + rnd.nextInt(20)).map { _ =>
          var k = 0
          while (k < vocab - 1 && rnd.nextDouble() > 0.35) k += 1
          s"w$k"
        }
        (i.toLong, toks.mkString(" "))
      }
      val ppm = Seq(20000L, 50000L, 120000L)(round - 1)
      val counts = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      val total = counts.values.sum
      val expected = counts.filter { case (_, c) =>
        BigInt(c) * 1000000 >= BigInt(ppm) * BigInt(total) }
      val got = TextAnalysis.heavyHitters(
          docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(8)), "text", ppm)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"ppm $ppm total $total")
    }
  }

  test("packWindows property: spans tile every window contiguously, only the last is short") {
    val docs = (1 to 50).map(i => (i.toLong, (0 until rnd.nextInt(40)).map(j => s"t$j").mkString(" ")))
    val ctx = 16
    val rows = TextAnalysis.packWindows(docs.toDF("doc_id", "text"), "text", "doc_id", ctx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val totalTokens = docs.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
    assert(rows.map(_._3).sum == totalTokens)
    val maxBin = rows.map(_._1).max
    rows.foreach { case (bin, nDocs, nToks, spans) =>
      val parsed = spans.split(",").map { s =>
        val Array(_, st, ln) = s.split(":"); (st.toLong, ln.toLong)
      }
      assert(parsed.length.toLong == nDocs)
      // contiguous tiling from offset 0
      var cursor = 0L
      parsed.foreach { case (st, ln) => assert(st == cursor, s"bin $bin"); cursor += ln }
      assert(cursor == nToks)
      if (bin < maxBin) assert(nToks == ctx.toLong, s"bin $bin not full")
    }
    // bins are consecutive 0..maxBin
    assert(rows.map(_._1).sorted.sameElements(0L to maxBin))
  }

  test("upsampleSources property: copies in {floor, ceil}, (id, epoch) unique, nested") {
    val docs = (1 to 300).map(i => (i.toLong, s"s${i % 5}")).toDF("doc_id", "source")
    val w = Map("s0" -> 170, "s1" -> 99, "s2" -> 300, "s3" -> 0)
    val out = TextAnalysis.upsampleSources(docs, "doc_id", "source", w, defaultPct = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.distinct.length == out.length) // (id, epoch) unique rows
    out.groupBy(t => (t._1, t._2)).foreach { case ((_, src), rows) =>
      val pct = w.getOrElse(src, 100)
      val n = rows.length
      assert(n == pct / 100 || n == pct / 100 + 1, s"$src -> $n copies")
      assert(rows.map(_._3).sorted.sameElements(0 until n))
    }
    assert(!out.exists(_._2 == "s3"))
    // nested: +30 percentage points only ever ADDS copies
    val more = TextAnalysis.upsampleSources(docs, "doc_id", "source",
      w.map { case (k, v) => k -> (v + 30) }, defaultPct = 130)
      .collect().groupBy(r => r.getLong(0)).view.mapValues(_.length).toMap
    val base = out.groupBy(_._1).view.mapValues(_.length).toMap
    base.foreach { case (id, n) => assert(more.getOrElse(id, 0) >= n, s"doc $id") }
  }

  test("bpe round-trip property: decode(encode(x)) == normalized-minus-spaces on random text") {
    val docs = (1 to 40).map { i =>
      val chars = "abcdef012 ,.!?"
      (i.toLong, (0 until 3 + rnd.nextInt(40)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(df, "text", numMerges = 6, minPairCount = 1)
      .orderBy("rank").collect()
      .map(r => r.getAs[String]("lhs") -> r.getAs[String]("rhs")).toSeq
    val rows = df.select(col("doc_id"),
        TextAnalysis.bpeDecodeIds(
          TextAnalysis.bpeTokenIds(col("text"), merges), merges).as("got"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      val want = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.replace(" ", "")
      assert(rows(id) == want, s"doc $id")
    }
  }

  test("shardByTokenBudget property: exact layout recomputation on random sizes") {
    val docs = (1 to 120).map(i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(j => s"x$j").mkString(" ")))
    val budget = 40L
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tokens = docs.map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong }.toMap
    var off = 0L
    val expected = docs.map(_._1).sortBy(id => (md5hex(id.toString), id)).map { id =>
      val s = off / budget; off += tokens(id); id -> s
    }.toMap
    val got = TextAnalysis.shardByTokenBudget(
        docs.toDF("doc_id", "text").repartition(5), "text", "doc_id", budget)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }
}
