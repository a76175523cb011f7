package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick phrase matching: overlap, nesting, failure-link
  * correctness, normalization, repeated-token phrases. */
class PhraseMatchSpec extends AnyFunSuite {

  private def run(phrases: Seq[String], text: String): Seq[String] = {
    val arr = PhraseAc.build(phrases).matches(text)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("adjacent tokens match; scattered tokens do not") {
    val got = run(Seq("customer data", "big table"),
      "the customer data lives in a table that is big")
    assert(got == Seq("customer data")) // "big" and "table" not adjacent
  }

  test("nested and overlapping phrases all fire (failure links)") {
    val phrases = Seq("new york", "new york city", "york city council")
    val got = run(phrases, "the new york city council met")
    assert(got == Seq("new york", "new york city", "york city council"))
  }

  test("failure links recover partial progress: abab-style token overlap") {
    // after reading [a b a] the automaton is deep in "a b a b"; the
    // next tokens [b c] must complete "a b a b" AND then "b c" via the
    // failure chain — a plain trie-restart scanner misses one
    val got = run(Seq("a b a b", "b c"), "a b a b c")
    assert(got == Seq("a b a b", "b c"))
  }

  test("normalization on both sides: case, punctuation, runs") {
    val got = run(Seq("Key-Order!", "SORT   merge"),
      "maintain key order, then sort/merge the runs")
    assert(got == Seq("key order", "sort merge"))
  }

  test("repeated-token phrase and duplicate matches dedup") {
    val got = run(Seq("batch batch batch"),
      "batch batch batch batch stream")
    assert(got == Seq("batch batch batch"))
    assert(run(Seq("x y"), "no match here").isEmpty)
  }
}
