package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-corpus pipelines (north-star
  * extension): language identification, quality scoring, token
  * counting, and document fingerprinting. Everything is a pure
  * codegen'd `Column` expression over one scan of the corpus — no UDFs,
  * no shuffle except the caller's own aggregations, so each scales
  * linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  // --- language identification (stopword-profile heuristic) ---------

  /** Tiny public stopword profiles. Scores are per-token hit ratios;
    * prediction is the argmax with deterministic alphabetical
    * tie-break.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit",
      "ein", "eine", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it",
      "that", "for"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "en", "para",
      "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour",
      "que", "des"))

  /** Languages in deterministic (alphabetical) preference order. */
  val langs: Seq[String] = stopwords.keys.toSeq.sorted

  /** Stopword-hit ratio for one language profile. */
  def langScore(text: Column, lang: String): Column = {
    val toks = tokens(text)
    val set = stopwords(lang)
    size(filter(toks, t => t.isin(set: _*))).cast("double") /
      size(toks).cast("double")
  }

  /** Predicted language: argmax score, earliest language wins ties. */
  def langPredict(text: Column): Column = {
    val scores = langs.map(l => l -> langScore(text, l))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      val others = scores.filter(_._1 != l).map(_._2)
      when(s > 0 && others.foldLeft(lit(true))((c, o) => c && s >= o),
        lit(l)).otherwise(acc)
    }
  }

  // --- quality scoring (Gopher-style repetition/shape gates) --------

  /** Mean token length = non-whitespace chars / token count. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") /
      size(tokens(text)).cast("double")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** English stopword-hit ratio (a Gopher-style "natural text" gate). */
  def stopRatio(text: Column): Column = langScore(text, "en")

  /** Composite document quality score in [0,1]: equal-weight gates on
    * token count, mean token length, stopword presence, and low
    * punctuation density.
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text))
    val gates = Seq(
      nTok.between(20, 100000),
      meanTokenLen(text).between(3.0, 10.0),
      stopRatio(text) >= 0.01,
      punctRatio(text) <= 0.1)
    gates.map(_.cast("int")).reduce(_ + _).cast("double") / gates.size
  }

  // --- token counting ----------------------------------------------

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation regex (GPT-2-style pre-tokenizer
    * simplified to engine-portable syntax: contraction suffixes, letter
    * runs, digit runs, symbol runs, whitespace runs).
    */
  val bpeRegex: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** BPE-ish token count (matches of [[bpeRegex]]). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeRegex), lit(0)))

  // --- document fingerprinting -------------------------------------

  /** Polynomial rolling hash of the token stream, mod [[Dedup.P]]:
    * fp = Σ tokenHash·B^i (Horner fold, B=131). Order-sensitive — two
    * docs with the same tokens in different order fingerprint
    * differently, unlike bag-of-words hashes.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => Dedup.h30(t)),
      lit(0L),
      (acc, h) => (acc * 131 + h) % Dedup.P)
}
