package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-based crop-requirement extraction (SURVEY §2.3 T11–T16) — the
  * reference's `CropRequirementExtractor`
  * (`etl/transform/nlp_extractor.py:34-196`). The reference loads spaCy
  * but no NER output feeds any result (SURVEY T16), so regex cascades
  * are the whole contract.
  *
  * Semantics preserved exactly: for each category the patterns are
  * tried in order, and within a pattern every match is tested against
  * the validity gate — the first passing match wins (the reference
  * iterates `re.finditer` for temperature and takes `re.search`'s first
  * match for the single-group categories; both reduce to
  * "first gate-passing match in pattern order").
  *
  * All of it is pure Catalyst expressions: `regexp_extract_all` +
  * higher-order `filter` over the match index sequence.
  */
object NlpExtract {

  /** Temperature-range patterns (`nlp_extractor.py:36-41`). */
  val temperaturePatterns: Seq[String] = Seq(
    "(?:temperature|temp)[^\\d]*(\\d+)[°°\\s]*[Cc][^\\d]*(?:to|and|-)[^\\d]*(\\d+)[°°\\s]*[Cc]",
    "(\\d+)\\s*°?[Cc]\\s*(?:to|-)\\s*(\\d+)\\s*°?[Cc]",
    "optimal.*?(\\d+)[°°\\s]*[Cc].*?(?:to|and|-).*?(\\d+)[°°\\s]*[Cc]",
    "grow.*?between.*?(\\d+)[°°\\s]*[Cc].*?and.*?(\\d+)[°°\\s]*[Cc]")

  /** Water-requirement patterns (`nlp_extractor.py:42-47`). */
  val waterPatterns: Seq[String] = Seq(
    "(\\d+\\.?\\d*)\\s*(?:mm|millimeters?)\\s*(?:per|\\/)\\s*(?:day|d)",
    "water.*?(\\d+\\.?\\d*)\\s*(?:mm|millimeters?)",
    "irrigation.*?(\\d+\\.?\\d*)\\s*(?:mm|L)",
    "requires?\\s+(\\d+\\.?\\d*)\\s*(?:mm|cm)\\s*(?:of\\s+)?water")

  /** Sunlight patterns (`nlp_extractor.py:48-53`). */
  val sunlightPatterns: Seq[String] = Seq(
    "(\\d+\\.?\\d*)\\s*(?:hours?|hrs?|h)\\s*(?:of\\s+)?(?:sun|light|daylight)",
    "sun.*?(\\d+)[\\s-]*(?:hours?|hrs?)",
    "full\\s+sun.*?(\\d+)\\s*(?:hours?|hrs?)",
    "light.*?(\\d+)\\s*(?:hours?|hrs?)")

  /** pH-range patterns (`nlp_extractor.py:54-58`). */
  val phPatterns: Seq[String] = Seq(
    "pH\\s+(\\d+\\.?\\d*)\\s*(?:to|-)\\s*(\\d+\\.?\\d*)",
    "pH.*?range.*?(\\d+\\.?\\d*).*?(?:to|-).*?(\\d+\\.?\\d*)",
    "(?:acidic|alkaline).*?pH\\s+(\\d+\\.?\\d*)\\s*(?:to|-)\\s*(\\d+\\.?\\d*)")

  /** First gate-passing (value, evidence) across a pattern cascade;
    * returns a struct col with fields v1..vN and `evidence`.
    *
    * `allMatches = true` mirrors the reference's `re.finditer` loop
    * (first gate-passing match anywhere); `false` mirrors `re.search`
    * (only the first match is gate-tested).
    *
    * Perf shape: the expensive full-text `regexp_extract_all` runs
    * exactly ONCE per pattern per row — it is bound through a
    * single-element-array `transform` lambda (expressions have no
    * `let`, but a higher-order-function argument is evaluated once),
    * and groups are re-extracted from each *matched substring* (tiny
    * strings, deterministic same groups since the patterns use no
    * anchors/lookaround). The naive form re-scanned the full text
    * ~5× per pattern.
    */
  private def cascade(text: Column, patterns: Seq[String], groups: Int,
      gate: Seq[Column] => Column, allMatches: Boolean = false,
      guards: Seq[Column] = Nil): Column = {
    val gs = if (guards.isEmpty) patterns.map(_ => lit(true)) else guards
    patterns.zip(gs).map { case (pat, g) =>
      val p = "(?i)" + pat
      val grp = (m: Column, g: Int) => regexp_extract(m, p, g)
      val res = get(transform(
        array(regexp_extract_all(text, lit(p), lit(0))),
        ms => {
          val idxs =
            if (allMatches) sequence(lit(1), size(ms))
            else array(lit(1))
          val valid = filter(idxs, i => i <= size(ms) &&
            gate((1 to groups).map(g => grp(element_at(ms, i), g))))
          val idx = when(size(ms) > 0, get(valid, lit(0)))
          val m0 = try_element_at(ms, idx)
          struct((1 to groups).map(g =>
            grp(m0, g).cast("double").as(s"v$g")) :+
            m0.as("evidence"): _*)
        }), lit(0))
      // bind `res` once (a bare when(cond, res) evaluates the whole
      // pattern scan twice — once for the condition, once for the
      // value; fallback expressions get no CSE), and pre-gate the scan
      // behind a cheap substring guard implied by the pattern, so
      // non-mentioning documents skip the regex entirely
      when(g, get(transform(array(res), r =>
        when(r.getField("evidence").isNotNull, r)), lit(0)))
    }.reduce(coalesce(_, _))
  }

  private def between(c: Column, lo: Double, hi: Double): Column =
    c.cast("double").between(lo, hi)

  /** T11 — temperature range: struct(v1=min, v2=max, evidence); both
    * values gated to [-10, 50] (`nlp_extractor.py:117-130`). Guards:
    * each pattern's mandatory literal ("temp", "optimal", "grow"); the
    * bare `N°C to N°C` pattern has no selective literal and stays
    * unguarded. */
  def temperatureRange(text: Column): Column = {
    val lowered = lower(text)
    cascade(text, temperaturePatterns, 2,
      gs => between(gs(0), -10, 50) && between(gs(1), -10, 50),
      allMatches = true,
      guards = Seq(lowered.contains("temp"), lit(true),
        lowered.contains("optimal"), lowered.contains("grow")))
  }

  /** T12 — water mm/day: struct(v1, evidence), gate [0.1, 50]
    * (`nlp_extractor.py:132-144`). */
  def waterRequirement(text: Column): Column = {
    val lowered = lower(text)
    cascade(text, waterPatterns, 1, gs => between(gs(0), 0.1, 50),
      guards = Seq(
        lowered.contains("mm") || lowered.contains("millimeter"),
        lowered.contains("water"), lowered.contains("irrigation"),
        lowered.contains("require")))
  }

  /** T13 — sunlight hours with qualitative fallback: numeric gate
    * [0, 24]; else "full sun" → 6.0, "partial shade" → 3.0
    * (`nlp_extractor.py:146-164`). */
  def sunlightHours(text: Column): Column = {
    val lowered = lower(text)
    val numeric = cascade(text, sunlightPatterns, 1,
      gs => between(gs(0), 0, 24),
      guards = Seq(
        lowered.contains("sun") || lowered.contains("light"),
        lowered.contains("sun"),
        // pattern 3 is full\s+sun — any whitespace run between the
        // words, so the guard must not assume a single space
        lowered.contains("full") && lowered.contains("sun"),
        lowered.contains("light")))
    coalesce(numeric,
      when(lowered.contains("full sun"),
        struct(lit(6.0).as("v1"),
          lit("full sun (inferred 6+ hours)").as("evidence"))),
      when(lowered.contains("partial shade"),
        struct(lit(3.0).as("v1"),
          lit("partial shade (inferred 3-6 hours)").as("evidence"))))
  }

  /** T14 — pH range: struct(v1=min, v2=max, evidence), both in [3, 9]
    * (`nlp_extractor.py:166-178`). */
  def phRange(text: Column): Column = {
    val lowered = lower(text)
    cascade(text, phPatterns, 2,
      gs => between(gs(0), 3.0, 9.0) && between(gs(1), 3.0, 9.0),
      guards = phPatterns.map(_ => lowered.contains("ph")))
  }

  /** T15 — confidence score (`nlp_extractor.py:180-196`). */
  def confidence(hasTemp: Column, hasWater: Column, hasSun: Column,
      hasPh: Column, evidenceCount: Column): Column = {
    val base = hasTemp.cast("double") * 0.3 + hasWater.cast("double") * 0.3 +
      hasSun.cast("double") * 0.2 + hasPh.cast("double") * 0.2
    least(base + least(evidenceCount.cast("double") * 0.05, lit(0.2)),
      lit(1.0))
  }

  /** T16 — full extraction: one struct column with the reference's
    * `ExtractedRequirements` fields (`nlp_extractor.py:70-115`). The
    * four cascade families are bound once through a HOF argument —
    * each family result is referenced 4–5 times below, and fallback
    * expressions get no CSE, so the naive form re-ran every regex
    * per reference. Callers projecting multiple fields should go
    * through a generator barrier (`explode(array(...))`) for the same
    * reason. */
  def extractRequirements(text: Column): Column =
    get(transform(array(struct(
        temperatureRange(text).as("t"),
        waterRequirement(text).as("w"),
        sunlightHours(text).as("s"),
        phRange(text).as("p"))), r => {
      val t = r.getField("t")
      val w = r.getField("w")
      val s = r.getField("s")
      val p = r.getField("p")
      val nEvidence = Seq(t, w, s, p)
        .map(_.isNotNull.cast("int")).reduce(_ + _)
      struct(
        t.getField("v1").as("temp_min_c"),
        t.getField("v2").as("temp_max_c"),
        w.getField("v1").as("water_mm_day"),
        s.getField("v1").as("sunlight_hours"),
        p.getField("v1").as("ph_min"),
        p.getField("v2").as("ph_max"),
        confidence(t.isNotNull, w.isNotNull, s.isNotNull, p.isNotNull,
          nEvidence).as("confidence_score"),
        lit("hybrid_regex_spark").as("extraction_method"),
        slice(filter(array(
          t.getField("evidence"), w.getField("evidence"),
          s.getField("evidence"), p.getField("evidence")),
          e => e.isNotNull), 1, 5).as("raw_evidence"))
    }), lit(0))

  /** T17 — simple numeric-pair extractor
    * (`etl/utils/validators.py:19-31`): (min, max) of the first two
    * numbers matched by a pattern. */
  def extractNumericPair(text: Column, pattern: String): Column = {
    val nums = regexp_extract_all(text, lit(pattern), lit(1))
    when(size(nums) >= 2, struct(
      least(element_at(nums, 1).cast("double"),
        element_at(nums, 2).cast("double")).as("lo"),
      greatest(element_at(nums, 1).cast("double"),
        element_at(nums, 2).cast("double")).as("hi")))
  }
}
