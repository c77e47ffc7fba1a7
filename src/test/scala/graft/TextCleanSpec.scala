package graft

import org.apache.spark.sql.functions._
import graft.functions.TextClean._

/** T1–T10 parity tests against the reference's transformer suite
  * (`tests/test_transformers.py:12-60`, FIXTURES.md A3/A5). */
class TextCleanSpec extends SparkSpec {

  test("T2 abbreviations expand longest-first with word boundaries") {
    assert(evalStr("The opt temp is high", expandAbbreviations) ==
      "The optimal temperature is high")
    // 'temperature' must not re-match inside the expansion
    assert(evalStr("temp range", expandAbbreviations) ==
      "temperature range")
    // word boundary: no match inside words
    assert(evalStr("attempt", expandAbbreviations) == "attempt")
  }

  test("T3 units normalize case-insensitively") {
    assert(evalStr("5 Millimeters of rain", normalizeUnits) ==
      "5 mm of rain")
    assert(evalStr("8 hrs light", normalizeUnits) == "8 hours light")
  }

  test("T4 citations: brackets, author-year, also-see tails") {
    assert(evalStr("Wheat grows [1,2] well", removeCitations) ==
      "Wheat grows  well")
    assert(evalStr("grows (Smith et al., 2020) fast", removeCitations) ==
      "grows  fast")
    assert(evalStr("ok. Also see the FAO site for more info here",
      removeCitations) == "ok. ")
  }

  test("T5 URLs and references section removed") {
    assert(evalStr("see https://fao.org/wheat now", removeReferences) ==
      "see  now")
    assert(evalStr("body\n References \ngone", removeReferences) == "body")
  }

  test("T6 number words become digits") {
    assert(evalStr("needs five to eight mm", standardizeNumbers) ==
      "needs 5 to 8 mm")
  }

  test("T8 smart case: uppercase lines title-case, rest lowercase") {
    assert(evalStr("WHEAT REQUIREMENTS", normalizeCase) ==
      "Wheat Requirements")
    assert(evalStr("Mixed Case Line", normalizeCase) == "mixed case line")
    // python title(): capitalizes after any non-letter
    assert(evalStr("WHEAT-BASED X", normalizeCase) == "Wheat-Based X")
  }

  test("T1 NFKC normalizes compatibility characters") {
    assert(evalStr("① ﬁ", s => nfkc(s)) == "1 fi")
  }

  test("T9 sentences: abbreviation protection and length filter") {
    val got = evalStr(
      "Dr. Smith studied wheat. It grows at 20C in spring. No. Done ok.",
      extractSentences).asInstanceOf[collection.Seq[String]]
    assert(got == Seq("Dr. Smith studied wheat.",
      "It grows at 20C in spring."))
  }

  test("T10 full pipeline golden") {
    // 'Opt.' → the dotted key can't match (\b after '.' needs a word
    // char), so the undotted 'opt' fires leaving the period — same as
    // the reference's chain.
    assert(evalStr("Opt. temp 20°c  to 25°c", s => clean(s)) ==
      "optimal. temperature 20°c to 25°c")
    // null → "" per the reference's `if not text: return ""` guard
    import spark.implicits._
    assert(Seq(Option.empty[String]).toDF("s")
      .select(clean(org.apache.spark.sql.functions.col("s")).as("v"))
      .collect()(0).getString(0) == "")
  }
}
