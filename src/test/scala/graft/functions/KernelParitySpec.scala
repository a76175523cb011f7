package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SparkTestSession, TextAnalysis}

/** DIFFERENTIAL parity: the single-pass native kernels
  * ([[PortableSig]], [[RepetitionStats]]) versus the exact SQL
  * formulations they replaced, on adversarial inputs the synthetic
  * corpus doesn't contain — interior tabs, non-space whitespace at the
  * edges (Spark's `trim` strips ASCII space ONLY), double spaces,
  * unicode tokens, single tokens, and heavy repetition. The DuckDB
  * gates pin the kernels at corpus scale; this pins the edge shapes. */
class KernelParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val nasty: Seq[(Long, String)] = Seq(
    1L -> "plain words here",
    2L -> "a",
    3L -> "a a a a a",
    4L -> "tab\tseparated\ttokens here",
    5L -> "\tleading tab stays after space-trim",
    6L -> "trailing newline stays\n",
    7L -> "double  space gap",
    8L -> "α β α β γ unicode tokens",
    9L -> "x y x y x y x y",
    10L -> "  surrounded by spaces  ",
    11L -> "one two three four five six seven eight nine ten",
    12L -> "repeat repeat repeat repeat",
    13L -> "Mixed CASE Tokens mixed case tokens",
    14L -> "punct, only. tokens! here?")

  def docs = nasty.toDF("doc_id", "text")

  test("RepetitionStats matches the explode+aggregate formulation on edge inputs") {
    val kernel = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

    // the ORIGINAL SQL formulation, verbatim
    val toks = split(trim(col("text")), "\\s+")
    val nonBlank = docs.filter(length(trim(col("text"))) > 0)
    val uni = nonBlank
      .select(col("doc_id").as("_id"), explode(toks).as("tok"))
      .groupBy(col("_id"), col("tok")).count()
      .groupBy(col("_id"))
      .agg(round(max(col("count")).cast("double") / sum(col("count")), 6)
        .as("top_unigram_frac"))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))
    val bi = nonBlank
      .select(col("doc_id").as("_id"), explode(bigrams).as("bg"))
      .groupBy(col("_id"), col("bg")).count()
      .groupBy(col("_id"))
      .agg(round((sum(col("count")) - count(lit(1))).cast("double") /
        sum(col("count")), 6).as("dup_bigram_frac"))
    val sql = uni.join(bi, Seq("_id"), "left")
      .select(col("_id"), col("top_unigram_frac"),
        coalesce(col("dup_bigram_frac"), lit(0.0)).as("dup_bigram_frac"))
      .orderBy("_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

    assert(kernel.toSeq == sql.toSeq)
  }

  test("PortableSig minhash signatures match the md5+conv+min formulation") {
    val numHashes = 8
    val kernel = docs.select(col("doc_id"),
      PortableSig.md5_minhash_sig(col("text"), 3,
        Seq.tabulate(numHashes)(Dedup.uhA), Seq.tabulate(numHashes)(Dedup.uhB),
        Dedup.uhP).as("sig"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))

    // the ORIGINAL SQL formulation, verbatim
    val exploded = docs.select(col("doc_id").as("id"),
      explode(ShingleStrings.shingle_strings(col("text"), 3)).as("s"))
      .select(col("id"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("x"))
    val sql = exploded.groupBy(col("id")).agg(
      min((col("x") * Dedup.uhA(0) + Dedup.uhB(0)) % Dedup.uhP).as("m0"),
      (1 until numHashes).map(i =>
        min((col("x") * Dedup.uhA(i) + Dedup.uhB(i)) % Dedup.uhP).as(s"m$i")): _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))

    assert(kernel.toSeq == sql.toSeq)
  }

  test("bounded-collect pair generation matches the self-join road across all LSH families") {
    // a corpus with planted near-dups, exact dups (hot buckets), and
    // unique docs: with a cap LARGER than any bucket, the bounded road
    // must emit exactly the pair set the exact (cap-off) join road does
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (
      (1L to 6L).map(i => (i, base)) ++                      // 6 exact dups
      Seq(7L -> (base + " tail"), 8L -> (base + " tails")) ++ // near-dups
      Seq(9L -> "completely different text about query engines and shuffles",
        10L -> "another unrelated document concerning buoy telemetry data")
    ).toDF("doc_id", "text")

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // minhash (production xxhash)
    assert(pairSet(Dedup.minhashLshPairs(corpus, "text", "doc_id", maxBucket = 100000)) ==
      pairSet(Dedup.minhashLshPairs(corpus, "text", "doc_id", maxBucket = 0)))
    // minhash portable, with and without est
    assert(pairSet(Dedup.minhashLshPairsPortable(corpus, "text", "doc_id", maxBucket = 100000)) ==
      pairSet(Dedup.minhashLshPairsPortable(corpus, "text", "doc_id", maxBucket = 0)))
    val estB = Dedup.minhashLshPairsPortable(corpus, "text", "doc_id",
      withEstimate = true, maxBucket = 100000)
    val estJ = Dedup.minhashLshPairsPortable(corpus, "text", "doc_id",
      withEstimate = true, maxBucket = 0)
    def estSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(estSet(estB) == estSet(estJ))
    // simhash, native and portable (payload-carrying road)
    assert(pairSet(Dedup.simhashPairs(corpus, "text", "doc_id", maxBucket = 100000)) ==
      pairSet(Dedup.simhashPairs(corpus, "text", "doc_id", maxBucket = 0)))
    assert(pairSet(Dedup.simhashPairsPortable(corpus, "text", "doc_id", maxBucket = 100000)) ==
      pairSet(Dedup.simhashPairsPortable(corpus, "text", "doc_id", maxBucket = 0)))
    // SRP vector buckets
    val vecs = (1L to 20L).map(i =>
      (i, Array.tabulate(8)(j => ((i % 4) + j * 0.1).toFloat))).toDF("id", "vec")
    assert(pairSet(graft.operators.Similarity.lshCandidatePairs(
        vecs, "id", "vec", planes = 4, maxBucket = 100000)) ==
      pairSet(graft.operators.Similarity.lshCandidatePairs(
        vecs, "id", "vec", planes = 4, maxBucket = 0)))
    // and the CAP still bites identically on the bounded road: 6 exact
    // dups capped at 3 members → 3 pairs from that cluster
    val capped = Dedup.minhashLshPairs(corpus.filter(col("doc_id") <= 6),
      "text", "doc_id", maxBucket = 3)
    assert(pairSet(capped) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("PortableSig simhash60 matches the packed-vote formulation") {
    val bits = 60
    val kernel = docs.select(col("doc_id"),
      PortableSig.md5_simhash60(col("text"), 3).as("sim"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))

    // the ORIGINAL SQL formulation, verbatim (20 packed counters)
    val exploded = docs.select(col("doc_id").as("id"),
      explode(ShingleStrings.shingle_strings(col("text"), 3)).as("s"))
      .select(col("id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
    val votes = exploded.groupBy(col("id")).agg(
      count(lit(1)).as("n"),
      (0 until bits / 3).map { k =>
        sum(shiftright(col("h"), 3 * k).bitwiseAND(lit(1L)) +
          shiftleft(shiftright(col("h"), 3 * k + 1).bitwiseAND(lit(1L)), 21) +
          shiftleft(shiftright(col("h"), 3 * k + 2).bitwiseAND(lit(1L)), 42))
          .as(s"p$k")
      }: _*)
    def cnt(j: Int) =
      shiftright(col(s"p${j / 3}"), 21 * (j % 3)).bitwiseAND(lit(0x1FFFFFL))
    val sql = votes.select(col("id"),
      (0 until bits).map { j =>
        when(cnt(j) * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)).as("sim"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(kernel.toSeq == sql.toSeq)
  }

  test("NgramStrings matches the transform+slice+concat_ws formulation " +
      "for n in 1..4 on edge inputs") {
    for (n <- 1 to 4) {
      val kernel = docs.select(col("doc_id"),
          explode(NgramStrings.ngram_strings(col("text"), n)).as("g"))
        .orderBy("doc_id", "g").collect()
        .map(r => (r.getLong(0), r.getString(1)))

      // the ORIGINAL interpreted formulation, verbatim (what
      // distinctNgrams used before the native kernel)
      val toks = split(trim(regexp_replace(lower(col("text")),
        "[^a-z0-9]+", " ")), " ")
      val gramArr = when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array())
      val sql = docs.select(col("doc_id"), explode(gramArr).as("g"))
        .filter(col("g") =!= "")
        .orderBy("doc_id", "g").collect()
        .map(r => (r.getLong(0), r.getString(1)))

      // the kernel never emits empty grams, so compare against the
      // filtered SQL stream — duplicates preserved, order by value
      assert(kernel.toSeq == sql.toSeq, s"n=$n")
    }
  }
}
