package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-PHRASE matching by token-level Aho–Corasick (Aho & Corasick,
  * CACM 1975 — public): one pass over the document's normalized tokens
  * finds every occurrence of every listed phrase, including phrases
  * that overlap or nest ("new york" inside "new york city"). The
  * single-token [[graft.operators.TextAnalysis.blocklistFilter]] can't
  * express phrases — "customer data" must match those two tokens
  * ADJACENT, not anywhere in the document.
  *
  * Both sides normalize with the engine-wide rule (lowercase, alnum
  * runs), so "Customer-Data!" matches a listed "customer data". The
  * automaton (token trie + BFS failure links + output links) is built
  * ONCE per JVM per phrase list (identity-keyed cache) and the scan is
  * O(tokens + matches) — the list rides in the plan like a broadcast;
  * phrase lists are thousands of entries, not data-sized.
  *
  * Returns the DISTINCT matched phrases, lexicographically sorted
  * (deterministic, oracle-friendly); empty array when nothing matches,
  * null text → null. */
case class PhraseMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(phrases.nonEmpty, "phrase list must not be empty")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "phrase_matches"

  @transient private lazy val automaton = PhraseAc.build(phrases)

  override def nullSafeEval(input: Any): Any =
    automaton.matches(input.asInstanceOf[UTF8String].toString)

  // codegen funnels through a registry keyed by a stable id so the
  // generated code references the SAME built automaton, not a rebuild
  // per row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseAc", automaton,
      classOf[PhraseAc].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matches($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseMatches =
    copy(child = newChild)
}

/** Token-alphabet Aho–Corasick automaton. Nodes are dense ints; goto
  * is a per-node hash map keyed by token (the token alphabet is
  * unbounded, so no 256-wide arrays); failure links by BFS; each node
  * carries the union of phrase outputs reachable through its failure
  * chain (precomputed, so the scan never walks failure chains for
  * output collection). */
class PhraseAc(
    goto: Array[java.util.HashMap[String, Int]],
    fail: Array[Int],
    out: Array[Array[String]]) extends Serializable {

  /** Distinct matched phrases in the normalized token stream of `text`,
    * sorted. */
  def matches(text: String): GenericArrayData = {
    val found = new java.util.TreeSet[String]()
    var state = 0
    // inline tokenizer — the ShingleStrings/fingerprint rule
    val s = text.toLowerCase
    val tok = new java.lang.StringBuilder
    var i = 0
    while (i <= s.length) {
      val boundary = i == s.length || {
        val c = s.charAt(i)
        !((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
      }
      if (!boundary) tok.append(s.charAt(i))
      else if (tok.length > 0) {
        val t = tok.toString; tok.setLength(0)
        var next = goto(state).getOrDefault(t, -1)
        while (next < 0 && state != 0) {
          state = fail(state)
          next = goto(state).getOrDefault(t, -1)
        }
        state = if (next >= 0) next else 0
        val o = out(state)
        var j = 0
        while (j < o.length) { found.add(o(j)); j += 1 }
      }
      i += 1
    }
    val arr = new Array[Any](found.size)
    val it = found.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

object PhraseAc {

  private def normalize(s: String): Array[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty)

  def build(phrases: Seq[String]): PhraseAc = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[String, Int]())
    val outs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[String])
    // trie of normalized token sequences; output = the ORIGINAL listed
    // phrase in normalized form (what callers audit/report on)
    phrases.foreach { p =>
      val toks = normalize(p)
      if (toks.nonEmpty) {
        var node = 0
        toks.foreach { t =>
          val next = goto(node).getOrDefault(t, -1)
          node = if (next >= 0) next
          else {
            goto += new java.util.HashMap[String, Int]()
            outs += scala.collection.mutable.Set.empty[String]
            goto(node).put(t, goto.length - 1)
            goto.length - 1
          }
        }
        outs(node) += toks.mkString(" ")
      }
    }
    require(goto.length > 1, "phrase list empty after normalization")
    // BFS failure links; output sets absorb the failure target's
    val fail = new Array[Int](goto.length)
    val queue = new java.util.ArrayDeque[Int]()
    goto(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      goto(u).forEach { (tok, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).containsKey(tok)) f = fail(f)
        fail(v) = if (goto(f).containsKey(tok) && goto(f).get(tok) != v)
          goto(f).get(tok) else 0
        outs(v) ++= outs(fail(v))
        queue.add(v)
      }
    }
    new PhraseAc(goto.toArray, fail, outs.map(_.toArray.sorted).toArray)
  }

  // ---------------------------------------------------------- Column API

  def phrase_matches(text: Column, phrases: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(PhraseMatches(
      org.apache.spark.sql.GraftSqlBridge.expression(text), phrases))
}
