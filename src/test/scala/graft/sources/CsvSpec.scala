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
}
