package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are narrow (per-row) transformations built from codegen'd
  * `functions._` — no UDFs, no shuffle, embarrassingly parallel at
  * 100 TB. Designed to run in a single scan over `documents`.
  */
object TextAnalysis {

  /** Whitespace token count. Empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: word chunks of ≤4 chars count 1, longer words
    * count ceil(len/4) — a deterministic proxy for tokenizer cost without
    * shipping a vocab. */
  def subwordCount(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    when(length(trim(text)) === 0, lit(0L)).otherwise(
      aggregate(words, lit(0L),
        (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")))
  }

  /** Quality signals: char length, token count, mean word length,
    * punctuation ratio, uppercase ratio, digit ratio, stopword ratio. */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val punct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val uppers = length(regexp_replace(t, "[^A-Z]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val toks = tokenCount(t)
    val stops = stopwordCount(t, englishStopwords)
    df.withColumn("n_chars_q", nChars.cast("long"))
      .withColumn("n_tokens", toks)
      .withColumn("mean_word_len",
        round(when(toks > 0, (nChars - (toks - 1)).cast("double") / toks)
          .otherwise(lit(0.0)), 4))
      .withColumn("punct_ratio",
        round(when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0), 6))
      .withColumn("upper_ratio",
        round(when(nChars > 0, uppers.cast("double") / nChars).otherwise(0.0), 6))
      .withColumn("digit_ratio",
        round(when(nChars > 0, digits.cast("double") / nChars).otherwise(0.0), 6))
      .withColumn("stopword_ratio",
        round(when(toks > 0, stops.cast("double") / toks).otherwise(0.0), 6))
  }

  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "was", "for", "on", "with", "as", "at", "by", "be")

  /** Count tokens that are in the stopword list (case-insensitive). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, regexp_replace(t, "[^a-z]", ""))))
  }

  /** Language-ID heuristic: score each candidate language by its stopword
    * hit count over the document tokens; argmax wins, ties broken by
    * language code order, zero hits → "und". Scales as one scan — the tiny
    * per-language stopword arrays live in the plan as literals. */
  val languageStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "was", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "que", "una", "por", "con"))

  def languageId(df: DataFrame, textCol: String,
      langs: Map[String, Seq[String]] = languageStopwords): DataFrame = {
    val scored = langs.toSeq.sortBy(_._1).foldLeft(df) { case (d, (code, stops)) =>
      d.withColumn(s"_score_$code", stopwordCount(col(textCol), stops))
    }
    val codes = langs.keys.toSeq.sorted
    val best = codes.tail.foldLeft(
      struct(col(s"_score_${codes.head}").as("s"), lit(codes.head).as("l"))) {
      (acc, code) =>
        when(col(s"_score_$code") > acc.getField("s"),
          struct(col(s"_score_$code").as("s"), lit(code).as("l"))).otherwise(acc)
    }
    scored.withColumn("lang_guess",
      when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")))
      .drop(codes.map(c => s"_score_$c"): _*)
  }

  /** Document fingerprint: normalized (lowercase, collapsed whitespace,
    * alnum-only) md5 — the exact-dup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))
}
