package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{NlpExtract, TextClean}

/** Text-cleaning (T1–T10) and NLP-extraction (T11–T17) queries. The
  * extraction queries run over *derived* crop-profile documents built
  * deterministically from `part` columns with printf-identical
  * formatting in both engines, so the regex cascades (and their
  * validity gates) are exercised with real matches, partial matches,
  * and gate failures. Oracle SQL is generated from the same pattern /
  * vocabulary constants the Spark expressions use.
  */
object NlpQueries {

  /** DuckDB `regexp_extract_all` over the derived text column. */
  private def reAll(pat: String, g: Int): String =
    s"regexp_extract_all(text, '(?i)$pat', $g)"

  /** DuckDB: gate-passing match index for a 2-group range pattern
    * (finditer semantics — every match tested). */
  private def idx2(pat: String, lo: Double, hi: Double): String =
    s"""list_filter(generate_series(1, len(${reAll(pat, 1)})),
       | i -> ${reAll(pat, 1)}[i]::DOUBLE BETWEEN $lo AND $hi
       |  AND ${reAll(pat, 2)}[i]::DOUBLE BETWEEN $lo AND $hi)[1]"""
      .stripMargin.replaceAll("\n", "")

  /** DuckDB: index 1 if the first match's groups all pass the gate
    * (re.search semantics — later matches never tested). */
  private def idx1(pat: String, lo: Double, hi: Double,
      groups: Int = 1): String = {
    val gates = (1 to groups)
      .map(g => s"${reAll(pat, g)}[1]::DOUBLE BETWEEN $lo AND $hi")
      .mkString(" AND ")
    s"CASE WHEN len(${reAll(pat, 1)}) > 0 AND $gates THEN 1 END"
  }

  private def pick(pat: String, g: Int, idx: String): String =
    s"(${reAll(pat, g)})[$idx]::DOUBLE"

  val all: Seq[Q] = Seq(

    // T10 full cleaning pipeline (non-aggressive): NFKC → abbreviation
    // expansion → unit normalization → whitespace collapse → smart
    // case. Oracle replays the same ordered vocabulary as a generated
    // regexp_replace chain (corpus is ASCII and lowercase, so the NFKC
    // and title() branches are identity there; unit tests cover them).
    {
      val chain = (TextClean.abbreviationsOrdered ++ TextClean.unitsMap)
        .foldLeft("text") { case (acc, (variant, standard)) =>
          val esc = variant.flatMap(c =>
            if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else s"$c")
          s"regexp_replace($acc, '(?i)\\b$esc\\b', '$standard', 'g')"
        }
      Q("q29_clean_pipeline", Some(s"""
      SELECT doc_id,
        trim(lower(regexp_replace($chain, '\\s+', ' ', 'g'))) AS clean_text
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TextClean.clean(col("text")).as("clean_text"))
          .orderBy("doc_id")
      }
    },

    // T11–T16 extraction over derived crop-profile docs: temperatures
    // (some above the 50°C gate), water (some outside [0.1,50]),
    // sunlight (some above 24h, with qualitative "full sun" fallback),
    // pH (some above 9), plus the T17 numeric-pair extractor and the
    // T15 confidence score.
    {
      val tempCoal = (g: Int) => NlpExtract.temperaturePatterns
        .map(p => pick(p, g, idx2(p, -10, 50))).mkString("COALESCE(", ", ", ")")
      val waterCoal = NlpExtract.waterPatterns
        .map(p => pick(p, 1, idx1(p, 0.1, 50))).mkString("COALESCE(", ", ", ")")
      val sunNum = NlpExtract.sunlightPatterns
        .map(p => pick(p, 1, idx1(p, 0, 24))).mkString("COALESCE(", ", ", ")")
      val phCoal = (g: Int) => NlpExtract.phPatterns
        .map(p => pick(p, g, idx1(p, 3, 9, groups = 2)))
        .mkString("COALESCE(", ", ", ")")
      val pairPat = "(-?\\d+\\.?\\d*)\\s*(?:°?[Cc])?"
      Q("q30_extract_requirements", Some(s"""
      WITH docs AS (
        SELECT p_partkey,
          printf('Optimal temperature %d°C to %d°C. Requires %d mm of water per day. Needs %d hours of sunlight. Soil pH %d.5 to %d.5.',
            p_partkey % 55 - 5, p_partkey % 55 - 5 + p_size % 15,
            p_partkey % 60, p_size % 30,
            2 + p_partkey % 7, 3 + p_partkey % 7)
          || CASE WHEN p_partkey % 7 = 0 THEN ' Prefers full sun.' ELSE '' END AS text
        FROM part),
      ext AS (
        SELECT p_partkey,
          ${tempCoal(1)} AS temp_min_c,
          ${tempCoal(2)} AS temp_max_c,
          $waterCoal AS water_mm_day,
          COALESCE($sunNum,
            CASE WHEN contains(lower(text), 'full sun') THEN 6.0
                 WHEN contains(lower(text), 'partial shade') THEN 3.0 END)
            AS sunlight_hours,
          ${phCoal(1)} AS ph_min,
          ${phCoal(2)} AS ph_max,
          CASE WHEN len(${reAll(pairPat, 1)}) >= 2 THEN
            least((${reAll(pairPat, 1)})[1]::DOUBLE, (${reAll(pairPat, 1)})[2]::DOUBLE)
          END AS pair_lo,
          CASE WHEN len(${reAll(pairPat, 1)}) >= 2 THEN
            greatest((${reAll(pairPat, 1)})[1]::DOUBLE, (${reAll(pairPat, 1)})[2]::DOUBLE)
          END AS pair_hi
        FROM docs)
      SELECT p_partkey, temp_min_c, temp_max_c, water_mm_day,
        sunlight_hours, ph_min, ph_max, pair_lo, pair_hi,
        least(
          CAST(temp_min_c IS NOT NULL AS DOUBLE) * 0.3
          + CAST(water_mm_day IS NOT NULL AS DOUBLE) * 0.3
          + CAST(sunlight_hours IS NOT NULL AS DOUBLE) * 0.2
          + CAST(ph_min IS NOT NULL AS DOUBLE) * 0.2
          + least(CAST(
              CAST(temp_min_c IS NOT NULL AS INT)
              + CAST(water_mm_day IS NOT NULL AS INT)
              + CAST(sunlight_hours IS NOT NULL AS INT)
              + CAST(ph_min IS NOT NULL AS INT) AS DOUBLE) * 0.05, 0.2),
          1.0) AS confidence_score
      FROM ext ORDER BY p_partkey""")) { (s, dir) =>
        val part = Tables.load(s, dir, "part")
        val docs = part.select(col("p_partkey"),
          concat(
            format_string(
              "Optimal temperature %d°C to %d°C. Requires %d mm of water per day. Needs %d hours of sunlight. Soil pH %d.5 to %d.5.",
              col("p_partkey") % 55 - 5,
              col("p_partkey") % 55 - 5 + col("p_size") % 15,
              col("p_partkey") % 60, col("p_size") % 30,
              col("p_partkey") % 7 + 2, col("p_partkey") % 7 + 3),
            when(col("p_partkey") % 7 === 0, " Prefers full sun.")
              .otherwise("")).as("text"))
        // generator barrier: the extraction struct is materialized once
        // per row; a flat select would projection-collapse into one full
        // cascade evaluation per output field
        docs.select(col("p_partkey"), explode(array(struct(
            NlpExtract.extractRequirements(col("text")).as("e"),
            NlpExtract.extractNumericPair(col("text"),
              "(?i)" + "(-?\\d+\\.?\\d*)\\s*(?:°?[Cc])?").as("pair"))))
            .as("r"))
          .select(col("p_partkey"),
            col("r.e.temp_min_c").as("temp_min_c"),
            col("r.e.temp_max_c").as("temp_max_c"),
            col("r.e.water_mm_day").as("water_mm_day"),
            col("r.e.sunlight_hours").as("sunlight_hours"),
            col("r.e.ph_min").as("ph_min"),
            col("r.e.ph_max").as("ph_max"),
            col("r.pair.lo").as("pair_lo"),
            col("r.pair.hi").as("pair_hi"),
            col("r.e.confidence_score").as("confidence_score"))
          .orderBy("p_partkey")
      }
    },

    // T9 sentence splitting over the same derived docs (portable
    // sentinel-split form of the reference's lookbehind split).
    Q("q31_sentences", Some("""
      WITH docs AS (
        SELECT p_partkey,
          printf('Optimal temperature %d°C to %d°C. Requires %d mm of water per day. Needs %d hours of sunlight. Soil pH %d.5 to %d.5.',
            p_partkey % 55 - 5, p_partkey % 55 - 5 + p_size % 15,
            p_partkey % 60, p_size % 30,
            2 + p_partkey % 7, 3 + p_partkey % 7)
          || CASE WHEN p_partkey % 7 = 0 THEN ' Prefers full sun.' ELSE '' END AS text
        FROM part),
      sent AS (
        SELECT p_partkey,
          list_transform(
            list_filter(
              string_split(
                regexp_replace(
                  regexp_replace(text, '(Dr|Mr|Mrs|Ms|Prof|Sr|Jr|vs|vol|fig|et al)\.', '\1<DOT>', 'g'),
                  '([.!?])\s+', '\1' || chr(1), 'g'),
                chr(1)),
              s -> length(s) > 10),
            s -> trim(replace(s, '<DOT>', '.'))) AS ss
        FROM docs)
      SELECT p_partkey, CAST(len(ss) AS INT) AS n_sentences,
        ss[1] AS s1, ss[2] AS s2, ss[3] AS s3, ss[4] AS s4, ss[5] AS s5
      FROM sent ORDER BY p_partkey""")) { (s, dir) =>
      val part = Tables.load(s, dir, "part")
      val docs = part.select(col("p_partkey"),
        concat(
          format_string(
            "Optimal temperature %d°C to %d°C. Requires %d mm of water per day. Needs %d hours of sunlight. Soil pH %d.5 to %d.5.",
            col("p_partkey") % 55 - 5,
            col("p_partkey") % 55 - 5 + col("p_size") % 15,
            col("p_partkey") % 60, col("p_size") % 30,
            col("p_partkey") % 7 + 2, col("p_partkey") % 7 + 3),
          when(col("p_partkey") % 7 === 0, " Prefers full sun.")
            .otherwise("")).as("text"))
      val ss = TextClean.extractSentences(col("text"))
      docs.select(Seq(col("p_partkey"), size(ss).as("n_sentences")) ++
          (1 to 5).map(i => try_element_at(ss, lit(i)).as(s"s$i")): _*)
        .orderBy("p_partkey")
    }
  )
}
