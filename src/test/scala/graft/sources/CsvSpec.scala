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
}
