package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning pipeline (SURVEY §2.3 T1–T10) — a faithful Spark
  * re-expression of the reference's `TextCleaner`
  * (`etl/transform/cleaners.py:14-183`): sequential regex rewrites over
  * ordered abbreviation/unit vocabularies, citation/reference removal,
  * number-word standardization, whitespace collapse, and smart case
  * normalization. Everything except NFKC and Python-`title()` is a pure
  * codegen'd expression; those two are the only UDFs in the engine
  * (SURVEY §2.9).
  */
object TextClean {

  /** Escape regex metacharacters (Python `re.escape` equivalent for the
    * vocabulary entries used here). */
  private def reEscape(s: String): String =
    s.flatMap(c => if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else s"$c")

  /** Agricultural abbreviation vocabulary, in the reference's insertion
    * order (`cleaners.py:21-49`); applied longest-first (stable sort),
    * case-insensitive, word-bounded. */
  val abbreviations: Seq[(String, String)] = Seq(
    "temp." -> "temperature", "temp" -> "temperature",
    "max." -> "maximum", "max" -> "maximum",
    "min." -> "minimum", "min" -> "minimum",
    "opt." -> "optimal", "opt" -> "optimal",
    "req." -> "required", "req" -> "required",
    "precip." -> "precipitation", "precip" -> "precipitation",
    "evap." -> "evapotranspiration", "evap" -> "evapotranspiration",
    "hum." -> "humidity", "hum" -> "humidity",
    "moist." -> "moisture", "moist" -> "moisture",
    "ph" -> "pH",
    "mm" -> "millimeters", "cm" -> "centimeters",
    "kg/ha" -> "kilograms per hectare", "t/ha" -> "tons per hectare",
    "°c" -> "°C",
    "deg c" -> "°C", "degrees c" -> "°C", "deg celsius" -> "°C")

  /** Longest-first, insertion-order-stable application order
    * (`cleaners.py:111-112`). */
  val abbreviationsOrdered: Seq[(String, String)] =
    abbreviations.sortBy(-_._1.length)

  /** Unit-variant vocabulary in insertion order (`cleaners.py:52-71`). */
  val unitsMap: Seq[(String, String)] = Seq(
    "millimeters" -> "mm", "millimeter" -> "mm",
    "mm/day" -> "mm/day", "mm d-1" -> "mm/day", "mm per day" -> "mm/day",
    "liters" -> "L", "liter" -> "L", "l/m2" -> "L/m²",
    "hours" -> "hours", "hour" -> "hours", "hrs" -> "hours",
    "hr" -> "hours", "h" -> "hours",
    "celsius" -> "°C", "centigrade" -> "°C", "fahrenheit" -> "°F",
    "percent" -> "%", "percentage" -> "%")

  private def vocabRewrite(c: Column, vocab: Seq[(String, String)]): Column =
    vocab.foldLeft(c) { case (acc, (variant, standard)) =>
      regexp_replace(acc, "(?i)\\b" + reEscape(variant) + "\\b", standard)
    }

  /** T2 — abbreviation expansion (`cleaners.py:109-118`). */
  def expandAbbreviations(c: Column): Column =
    vocabRewrite(c, abbreviationsOrdered)

  /** T3 — unit normalization (`cleaners.py:120-125`). */
  def normalizeUnits(c: Column): Column = vocabRewrite(c, unitsMap)

  /** T4 — citation removal (`cleaners.py:127-135`). */
  def removeCitations(c: Column): Column = {
    val noBrackets = regexp_replace(c, "\\[\\d+(?:,\\s*\\d+)*\\]", "")
    val noAuthorYear = regexp_replace(noBrackets,
      "\\([A-Z][a-z]+(?:\\s+et\\s+al\\.?)?,\\s*\\d{4}[a-z]?\\)", "")
    regexp_replace(noAuthorYear,
      "(?i)also see.*?(?:for more|more info|details).*", "")
  }

  /** T5 — URL + references-section removal (`cleaners.py:137-143`). */
  def removeReferences(c: Column): Column = {
    val noUrls = regexp_replace(c,
      "http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\\\\(\\\\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+",
      "")
    element_at(split(noUrls, "(?i)\\n\\s*References?\\s*\\n"), 1)
  }

  /** Number-word vocabulary (`cleaners.py:147-152`), insertion order. */
  val numberWords: Seq[(String, String)] = Seq(
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9", "ten" -> "10", "twenty" -> "20",
    "thirty" -> "30")

  /** T6 — written numbers → digits (`cleaners.py:145-158`). */
  def standardizeNumbers(c: Column): Column =
    numberWords.foldLeft(c) { case (acc, (word, digit)) =>
      regexp_replace(acc, "(?i)\\b" + word + "\\b", digit)
    }

  /** T7 — whitespace collapse (`cleaners.py:160-163`). */
  def cleanWhitespace(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** Python `str.title()` — capitalizes after ANY non-letter (unlike
    * Spark's whitespace-word `initcap`), needed for exact T8 parity.
    * One of the engine's two UDFs (SURVEY §2.9).
    */
  val pyTitle: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val sb = new StringBuilder(s.length)
        var prevCased = false
        for (ch <- s) {
          val cased = ch.isLetter
          sb += (if (cased && !prevCased) ch.toUpper else ch.toLower)
          prevCased = cased
        }
        sb.toString
      }
    }

  /** T1 — NFKC unicode normalization (`cleaners.py:105-107`); the
    * engine's other UDF. */
  val nfkc: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFKC)
    }

  /** T8 — smart case: per line, >50% uppercase ⇒ `title()`, else
    * lowercase (`cleaners.py:165-175`). The uppercase ratio is a pure
    * expression; only the title branch needs the UDF.
    */
  def normalizeCase(c: Column): Column = {
    val perLine = (line: Column) =>
      when(length(regexp_replace(line, "[^A-Z]", "")) * 2 > length(line),
        pyTitle(line)).otherwise(lower(line))
    array_join(transform(split(c, "\n"), perLine), "\n")
  }

  /** T10 — full cleaning pipeline (`cleaners.py:78-103`). Null input
    * yields the empty string, matching the reference's
    * `if not text: return ""` guard. */
  def clean(c: Column, aggressive: Boolean = false): Column = {
    val base = normalizeUnits(expandAbbreviations(nfkc(coalesce(c,
      lit("")))))
    val mid =
      if (aggressive)
        standardizeNumbers(removeReferences(removeCitations(base)))
      else base
    trim(normalizeCase(cleanWhitespace(mid)))
  }

  /** T9 — sentence splitter (`cleaners.py:177-183`). The reference uses
    * a lookbehind split `(?<=[.!?])\s+`; this uses the equivalent
    * capture-and-sentinel rewrite (`([.!?])\s+` → `$1` + split),
    * which has identical observable semantics and is expressible in
    * lookbehind-free regex engines (RE2) too. Abbreviations are
    * `<DOT>`-protected first; fragments of raw length ≤ 10 are dropped,
    * then trimmed with the sentinel restored.
    */
  def extractSentences(c: Column): Column = {
    val protectedText = regexp_replace(c,
      "(Dr|Mr|Mrs|Ms|Prof|Sr|Jr|vs|vol|fig|et al)\\.", "$1<DOT>")
    val marked = regexp_replace(protectedText, "([.!?])\\s+", "$1\u0001")
    val parts = split(marked, "\u0001")
    transform(
      filter(parts, s => length(s) > 10),
      s => trim(regexp_replace(s, "<DOT>", ".")))
  }
}
