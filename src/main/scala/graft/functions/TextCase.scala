package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Case-conversion functions (F7, `Json2GeoJSON.py:130-160`) expressed
  * as codegen'd Column combinators — no UDFs. `Title` reproduces the
  * reference's minor-word-aware title case including its quirks: the
  * minor-word list contains `"so,"` (with comma, so plain `so` is NOT
  * minor), hyphenated words capitalize each segment, and a word
  * containing `: . ? !` re-capitalizes the following word.
  */
object TextCase {

  /** `str.capitalize()` semantics: first char upper, REST lower. */
  def capital(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 1000000)))

  /** Every whitespace-separated word capitalized (AllCapital). */
  def allCapital(c: Column): Column =
    concat_ws(" ", transform(split(c, "\\s+"), w => capitalizeWord(w)))

  private def capitalizeWord(w: Column): Column =
    concat(upper(substring(w, 1, 1)), lower(substring(w, 2, 1000000)))

  /** Reference minor-word set (`Json2GeoJSON.py:130`) — note `"so,"`. */
  val minorWords: Seq[String] = Seq("and", "as", "but", "for", "if", "nor",
    "or", "so,", "yet", "a", "an", "the", "at", "by", "in", "of", "off",
    "on", "per", "to", "up", "via")

  /** Minor-word-aware Title case. The "capitalize after sentence
    * punctuation" flag is a running state over words → expressed with a
    * fold (aggregate) that carries (output, flag). */
  def title(c: Column): Column = {
    val words = split(lower(c), "\\s+")
    val minors = array(minorWords.map(lit): _*)
    val folded = aggregate(
      words,
      struct(lit("").as("acc"), lit(true).as("flag")),
      (state, w) => {
        val acc = state.getField("acc")
        val flag = state.getField("flag")
        val cased = when(w.contains("-"),
          concat_ws("-", transform(split(w, "-"), s => capitalizeWord(s))))
          .when(flag || !array_contains(minors, w), capitalizeWord(w))
          .otherwise(w)
        val newFlag = w.rlike("[:.?!]")
        struct(
          when(acc === "", cased).otherwise(concat(acc, lit(" "), cased)).as("acc"),
          newFlag.as("flag"))
      })
    folded.getField("acc")
  }

  /** CamelCase: every word capitalized, no separators. */
  def camelUpper(c: Column): Column =
    concat_ws("", transform(split(c, "\\s+"), w => capitalizeWord(w)))

  /** camelCase: first word lowered, rest capitalized, no separators. */
  def camelLower(c: Column): Column = {
    val words = split(c, "\\s+")
    val first = lower(element_at(words, 1))
    val rest = concat_ws("", transform(slice(words, 2, 1000000), w => capitalizeWord(w)))
    concat(first, rest)
  }

  /** First letter of every word. */
  def acronym(c: Column): Column =
    concat_ws("", transform(split(c, "\\s+"), w => substring(w, 1, 1)))

  /** F8 width truncate + first-row pad (`Json2GeoJSON.py:236-246`). */
  def clipToWidth(c: Column, width: Int): Column = substring(c, 1, width)
  def padToWidth(c: Column, width: Int): Column = rpad(c, width, " ")

  /** F11 unicode un-escaping (`Json2GeoJSON.py:201-203`): `\\u`→`\u`,
    * `\\n`→newline, `\\t`→tab, `\\x`→`\u00`. */
  def unescape(c: Column): Column = {
    val u = regexp_replace(c, "\\\\\\\\u", "\\\\u")
    val n = regexp_replace(u, "\\\\\\\\n", "\n")
    val t = regexp_replace(n, "\\\\\\\\t", "\t")
    regexp_replace(t, "\\\\\\\\x", "\\\\u00")
  }

  /** F12 name sanitization (`agol_wrangler.py:392-394`) + field-name
    * length limit (`Json2GeoJSON.py:189-193`). */
  def sanitizeName(c: Column, maxLen: Int = 31): Column =
    substring(regexp_replace(c, "[^0-9A-Za-z_]+", "_"), 1, maxLen)
}
