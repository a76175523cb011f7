package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.erddap.Csv

class CsvSpec extends AnyFunSuite {

  test("plain split keeps trailing empties") {
    assert(Csv.split("a,b,,").toSeq == Seq("a", "b", "", ""))
  }

  test("quoted field with commas") {
    assert(Csv.split("x,\"a, b\",y").toSeq == Seq("x", "a, b", "y"))
  }

  test("doubled quotes inside quoted field") {
    assert(Csv.split("\"say \"\"hi\"\"\",2").toSeq == Seq("say \"hi\"", "2"))
  }

  test("join quotes only what needs it and round-trips") {
    val cells = Seq("plain", "a, b", "q\"q", "")
    assert(Csv.join(cells) == "plain,\"a, b\",\"q\"\"q\",")
    assert(Csv.split(Csv.join(cells)).toSeq == cells)
  }

  test("property: split(join(cells)) == cells for adversarial cell content") {
    // deterministic generator over the characters that exercise every
    // codec state: quotes, commas, empties, and plain runs
    val alphabet = Array("", "a", ",", "\"", "\"\"", "x,y", "\",\"", "q\"",
      "\"q", " lead", "trail ", "a\"b\"c", ",,", "\"\"\"")
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(6) + 1
      val cells = Seq.fill(n)(
        Seq.fill(rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString)
      val back = Csv.split(Csv.join(cells)).toSeq
      assert(back == cells, s"round-trip failed for ${cells.map(c => s"[$c]")}")
    }
  }

  test("recordLines: quoted CR/LF is content, unquoted terminates; trailing newline adds no record") {
    assert(Csv.recordLines("a,b\nc,d\n") == Seq("a,b", "c,d"))
    assert(Csv.recordLines("a,b\r\nc,d") == Seq("a,b", "c,d"))
    assert(Csv.recordLines("a,\"x\ny\",b\nz,z,z\n") ==
      Seq("a,\"x\ny\",b", "z,z,z"))
    assert(Csv.recordLines("\"crlf\r\ninside\",1\n2,\"\"\"\n\"\"\"") ==
      Seq("\"crlf\r\ninside\",1", "2,\"\"\"\n\"\"\""))
    // interior empty line IS a record (an all-empty row); trailing is not
    assert(Csv.recordLines("a\n\nb\n") == Seq("a", "", "b"))
    assert(Csv.recordLines("") == Seq())
  }

  test("property: multi-line cells round-trip join+terminator → recordLines → split") {
    // the full writer→reader path: rows serialized with join and a \n
    // terminator per record (exactly what the portal sink writes), then
    // record-split and cell-split back. Cells include every framing
    // hazard: bare/quoted newlines, CRLF, quotes, commas, and mixes.
    val alphabet = Array("", "a", ",", "\"", "\n", "\r\n", "\r", "x,y",
      "line1\nline2", "\"q\nq\"", "end\n", "\ncr", "a\"b\nc", "\"\"\n")
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(5) + 1)(
        Seq.fill(rnd.nextInt(5) + 1)(
          Seq.fill(rnd.nextInt(3))(alphabet(rnd.nextInt(alphabet.length)))
            .mkString))
      val text = rows.map(Csv.join(_) + "\n").mkString
      val back = Csv.recordLines(text).map(Csv.split(_).toSeq)
      assert(back == rows,
        s"round-trip failed for ${rows.map(_.map(c => s"[$c]"))}")
    }
  }
}
