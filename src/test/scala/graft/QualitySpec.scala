package graft

import org.apache.spark.sql.functions._
import graft.quality._

/** Quality-rule compiler semantics: YAML parsing, per-rule violation
  * counting, fused-report correctness. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  val yaml = """
tables:
  t:
    not_null_columns: [a]
    unique_columns: [a]
    validations:
      b:
        type: range
        min: 0.0
        max: 10.0
        critical: true
      c:
        type: enum
        values: [x, y]
      d:
        type: regex
        pattern: "^[a-z]+$"
    cross_validations:
      - name: b_lt_100
        expression: "b < 100"
referential_integrity:
  t.a:
    references: r.k
freshness:
  t:
    max_age_days: 10
    date_column: dt
completeness:
  t:
    threshold_percent: 90.0
    columns: [b]
anomalies:
  big_jump:
    table: t
    condition: "abs(b - LAG(b) OVER (ORDER BY a)) > 5"
    severity: warning
"""

  lazy val rules = QualityConfig.parse(yaml)

  test("parser produces the full rule set with severities") {
    assert(rules.size == 10)
    val byName = rules.map(r => r.name -> r).toMap
    assert(byName("range_t_b").severity == "critical")
    assert(byName("enum_t_c").severity == "warning")
    assert(byName("not_null_t_a").severity == "critical")
    assert(byName("ri_t_a").asInstanceOf[RefIntegrityRule]
      .refTable == "r")
    assert(byName("freshness_t").asInstanceOf[FreshnessRule]
      .maxAgeDays == 10)
    assert(byName("anomaly_big_jump").severity == "warning")
  }

  test("anomaly fusion: plain predicates fuse, aggregates keep spark.sql") {
    val y = """
anomalies:
  plain_extreme:
    table: t
    condition: "b > 50"
    severity: critical
  agg_empty:
    table: t
    condition: "count(*) = 0"
    severity: critical
"""
    val t = Seq((1L, 10.0), (2L, 60.0), (3L, 70.0)).toDF("a", "b")
    val rep = QualitySuite.report(spark, Map("t" -> t),
        QualityConfig.parse(y), lit("2026-01-05").cast("date"))
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(rep("anomaly_plain_extreme") == 2) // 60, 70
    // an aggregate condition must NOT be fused into the row scan
    // (nested aggregate would explode) — it runs via spark.sql
    assert(rep("anomaly_agg_empty") == 0)     // table is not empty
  }

  test("unique_columns is one composite key; freshness needs date_column") {
    val y = """
tables:
  dim_soil:
    unique_columns: [location_key, extraction_date]
freshness:
  dim_soil:
    max_age_days: 365
"""
    val rs = QualityConfig.parse(y)
    // the reference's dim_soil declares UNIQUE(location_key,
    // extraction_date) — one composite rule, not two per-column rules
    assert(rs.collect { case u: UniqueRule => u.columns } ==
      Seq(Seq("location_key", "extraction_date")))
    // reference freshness entries carry no date_column → skipped, not
    // a NoSuchElementException
    assert(!rs.exists(_.isInstanceOf[FreshnessRule]))
    val soil = Seq((1L, "2026-01-01"), (1L, "2026-02-01"), (2L, "2026-01-01"))
      .toDF("location_key", "extraction_date")
    val rep = QualitySuite.report(spark, Map("dim_soil" -> soil), rs,
        lit("2026-01-05").cast("date"))
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    // one location with two extraction dates is NOT a violation
    assert(rep("unique_dim_soil_location_key_extraction_date") == 0)
  }

  test("etl gates evaluate against the audit log") {
    val audit = Seq(
      (1L, "RUNNING", "2026-01-01 00:00:00", None: Option[Long]),
      (1L, "SUCCESS", "2026-01-01 00:30:00", Some(500L)),
      (2L, "RUNNING", "2026-01-01 00:00:00", None: Option[Long]),
      (2L, "FAILED", "2026-01-01 02:00:00", None: Option[Long]),
      (3L, "RUNNING", "2026-01-01 00:00:00", None: Option[Long]),
      (3L, "SUCCESS", "2026-01-01 00:10:00", Some(5L)))
      .toDF("batch_id", "status", "event_time", "records_processed")
      .withColumn("event_time", col("event_time").cast("timestamp"))
      .withColumn("pipeline_name", lit("p"))
      .withColumn("error_message", lit(null).cast("string"))
    val y = """
etl_gates:
  extract:
    max_error_rate: 0.1
  load:
    min_rows_loaded: 100
    max_load_time_minutes: 60
"""
    val rep = QualitySuite.report(spark, Map("etl_audit_log" -> audit),
        QualityConfig.parse(y), lit("2026-01-05").cast("date"))
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(rep("gate_extract_max_error_rate") == 1)     // 1/3 > 0.1
    assert(rep("gate_load_min_rows_loaded") == 1)       // batch 3: 5 rows
    assert(rep("gate_load_max_load_time_minutes") == 1) // batch 2: 120 min
  }

  test("report counts violations per rule (fused + individual paths)") {
    val t = Seq(
      (Some(1L), 5.0, "x", "ok", "2026-01-01"),
      (Some(1L), 55.0, "z", "BAD", "2025-01-01"),   // dup a, range, enum, regex
      (None, -3.0, "y", "fine", "2026-01-02"))      // null a, range
      .toDF("a", "b", "c", "d", "dt")
    val r = Seq(1L).toDF("k")
    val rep = QualitySuite.report(spark, Map("t" -> t, "r" -> r),
        rules, lit("2026-01-05").cast("date"))
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(rep("range_t_b") == 2)       // 55, -3
    assert(rep("enum_t_c") == 1)        // z
    assert(rep("regex_t_d") == 1)       // BAD
    assert(rep("not_null_t_a") == 1)
    assert(rep("unique_t_a") == 1)      // {1,1,null} → 3 rows, 2 distinct
    assert(rep("cross_t_b_lt_100") == 0)
    assert(rep("ri_t_a") == 0)          // both non-null a=1 exist in r
    assert(rep("freshness_t") == 0)     // max dt 4 days old < 10
    assert(rep("completeness_t_b") == 0)
    assert(rep("anomaly_big_jump") == 2) // 5→55, 55→-3
  }

  test("custom_validations: reference SQL rules with asOf-bound CURRENT_DATE") {
    val dimSoil = Seq(
      (1L, "2025-01-01", Some(30.0), 30.0, 40.0),  // sums to 100
      (2L, "2025-01-02", Some(30.0), 30.0, 50.0),  // 110 → violation
      (3L, "2025-01-03", None, 60.0, 45.0))        // null clay → 105, |Δ|=5 not >5
      .toDF("location_key", "extraction_date", "clay_content_0_5cm",
        "sand_content_0_5cm", "silt_content_0_5cm")
    val dimCrop = Seq(
      (1L, "wheat", 5.0, 30.0),
      (2L, "maize", 20.0, 15.0),   // max < min → violation
      (3L, "rice", 10.0, 10.0))    // max == min → violation
      .toDF("crop_key", "crop_name", "temp_min_c", "temp_max_c")
    val factWeather = Seq((1L, "2019-06-01"), (1L, "2023-06-01"),
        (2L, "2020-01-01"))
      .toDF("location_key", "date_key")
      .withColumn("date_key", col("date_key").cast("date"))
    val rep = QualitySuite.report(spark,
        Map("dim_soil" -> dimSoil, "dim_crop" -> dimCrop,
          "fact_weather" -> factWeather),
        QualityConfig.parse(graft.operators.QualityQueries.refCustomYaml),
        lit("2020-01-01").cast("date"))
      .collect().map(x => x.getString(0) ->
        (x.getString(1), x.getString(2), x.getLong(3), x.getLong(4))).toMap
    assert(rep("custom_soil_texture_composition") ==
      ("dim_soil", "warning", 1L, 3L))
    assert(rep("custom_crop_temperature_range") ==
      ("dim_crop", "critical", 2L, 3L))
    // 2023-06-01 is in the PAST of the wall clock but the FUTURE of the
    // 2020 asOf — counting it proves CURRENT_DATE is bound to asOf
    // (reproducible / backfillable), not to the machine clock
    assert(rep("custom_future_weather_data") ==
      ("fact_weather", "critical", 1L, 3L))
  }

  test("custom rule table attribution: CTE-leading SQL, explicit " +
      "table key, missing table, view cleanup") {
    val y = """
custom_validations:
  - name: cte_lead
    severity: warning
    sql: >
      WITH cte AS (SELECT k FROM qv_aux)
      SELECT qv_t.k FROM qv_t JOIN cte ON qv_t.k = cte.k
      WHERE qv_t.v > 10
  - name: explicit
    severity: warning
    table: qv_aux
    sql: SELECT * FROM qv_t WHERE v > 10
"""
    val rules = QualityConfig.parse(y)
    val byName = rules.collect { case c: CustomSqlRule => c }
      .map(c => c.ruleName -> c).toMap
    // heuristic: first depth-0 FROM that is not a CTE → the main
    // query's table, not the CTE body's
    assert(byName("cte_lead").table == "qv_t")
    // explicit YAML table: key wins over the heuristic
    assert(byName("explicit").table == "qv_aux")
    // RECURSIVE and column-list CTE forms are recognized too: the main
    // query selects FROM the CTE, so attribution falls through to the
    // CTE body's base table
    assert(CustomSqlRule.fromTable(
      "WITH RECURSIVE r AS (SELECT x FROM real_t) SELECT * FROM r")
      .contains("real_t"))
    assert(CustomSqlRule.fromTable(
      "WITH c(k) AS (SELECT x FROM real_t) SELECT * FROM c")
      .contains("real_t"))
    val t = Seq((1L, 5.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val aux = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val rep = QualitySuite.report(spark,
        Map("qv_t" -> t, "qv_aux" -> aux), rules,
        lit("2026-01-01").cast("date"))
      .collect().map(x => x.getString(0) ->
        (x.getString(1), x.getLong(3), x.getLong(4))).toMap
    assert(rep("custom_cte_lead") == ("qv_t", 2L, 3L))
    assert(rep("custom_explicit") == ("qv_aux", 2L, 2L))
    // the batch's temp views are dropped after the report — nothing
    // lingers in the shared session catalog
    assert(!spark.catalog.tableExists("qv_t"))
    assert(!spark.catalog.tableExists("qv_aux"))
    // a rule whose table is absent from the map reports n_rows 0, not
    // the violation count
    val (v0, n0) = QualitySuite.violationCount(spark, Map("qv_t" -> t),
      CustomSqlRule("m", "SELECT * FROM qv_t WHERE v > 10", "warning",
        Some("absent")), lit("2026-01-01").cast("date"))
    assert((v0, n0) == (2L, 0L))
  }

  test("metrics with no monitoring defs returns an empty, " +
      "well-shaped frame") {
    val asOf = lit("2026-01-01").cast("date")
    val m = QualitySuite.metrics(spark, Map(), Nil, Nil,
      spark.emptyDataFrame, asOf)
    assert(m.columns.toSeq ==
      Seq("metric_name", "target", "bucket", "metric_value"))
    assert(m.count() == 0)
    // a record_count metric ranging over zero tables likewise
    val m2 = QualitySuite.metrics(spark, Map(),
      Seq(MetricDef("daily_record_count", Nil, "", Map())), Nil,
      spark.emptyDataFrame, asOf)
    assert(m2.count() == 0)
  }

  test("monitoring metrics: daily counts, pass-rate score, completeness") {
    val y = """
completeness:
  fact_soil:
    threshold_percent: 80.0
    columns: [moisture]
monitoring:
  metrics:
    - name: daily_record_count
      tables: [fact_soil]
      schedule: "0 9 * * *"
      date_columns:
        fact_soil: sample_date
    - name: weekly_quality_score
    - name: monthly_completeness_report
"""
    val fs = Seq(("2026-01-01", Some(1.0)), ("2026-01-01", None),
        ("2026-01-02", Some(2.0)), ("2026-01-02", Some(3.0)))
      .toDF("sample_date", "moisture")
      .withColumn("sample_date", col("sample_date").cast("date"))
    val rules = QualityConfig.parse(y)
    val defs = QualityConfig.parseMetrics(y)
    assert(defs.map(_.metricName) == Seq("daily_record_count",
      "weekly_quality_score", "monthly_completeness_report"))
    val asOf = lit("2026-02-01").cast("date")
    val tables = Map("fact_soil" -> fs)
    val rep = QualitySuite.report(spark, tables, rules, asOf)
    val m = QualitySuite.metrics(spark, tables, defs, rules, rep, asOf)
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2))
        -> x.getDouble(3)).toMap
    assert(m(("daily_record_count", "fact_soil", "2026-01-01")) == 2.0)
    assert(m(("daily_record_count", "fact_soil", "2026-01-02")) == 2.0)
    // moisture 75% complete < 80% threshold → the one rule fails → 0
    assert(m(("weekly_quality_score", "(all)", "2026-02-01")) == 0.0)
    assert(m(("monthly_completeness_report", "fact_soil.moisture",
      "2026-02-01")) == 75.0)
  }

  test("a declared metric with an unknown name raises, never drops") {
    val e = intercept[RuntimeException] {
      QualitySuite.metrics(spark, Map(),
        Seq(MetricDef("bogus_metric", Nil, "", Map())), Nil,
        spark.emptyDataFrame, lit("2026-01-01").cast("date"))
    }
    assert(e.getMessage.contains("bogus_metric"))
  }

  test("table_thresholds compiles to whole-table completeness rules") {
    val y = """
completeness:
  global_threshold: 95.0
  table_thresholds:
    t: 80.0
"""
    val rs = QualityConfig.parse(y)
    assert(rs == Seq(CompletenessRule("t", "*", 80.0)))
    // 3 rows × 2 cols = 6 cells, 2 null → 66.7% < 80% → violated
    val t = Seq((Some(1L), Some(1.0)), (None, Some(2.0)), (None, None))
      .toDF("a", "b")
    val rep = QualitySuite.report(spark, Map("t" -> t), rs,
        lit("2026-01-05").cast("date"))
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(rep("completeness_t_*") == 1)
  }

  test("the reference's own data-quality.yml compiles end-to-end") {
    val p = java.nio.file.Paths
      .get("/root/reference/.github/workflows/data-quality.yml")
    assume(java.nio.file.Files.exists(p),
      "reference config not present in this environment")
    val y = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val rs = QualityConfig.parse(y)
    val custom = rs.collect { case c: CustomSqlRule => c }
    assert(custom.map(c => c.ruleName -> c.severity).toMap == Map(
      "soil_texture_composition" -> "warning",
      "crop_temperature_range" -> "critical",
      "future_weather_data" -> "critical"))
    assert(custom.map(c => c.ruleName -> c.table).toMap == Map(
      "soil_texture_composition" -> "dim_soil",
      "crop_temperature_range" -> "dim_crop",
      "future_weather_data" -> "fact_weather"))
    val defs = QualityConfig.parseMetrics(y)
    assert(defs.map(_.metricName) == Seq("daily_record_count",
      "weekly_quality_score", "monthly_completeness_report"))
    assert(defs.head.tables == Seq("fact_weather", "fact_soil"))
    // the rest of the file's vocabulary compiles too — nothing dropped
    assert(rs.collect { case CompletenessRule(t, "*", _) => t }.sorted ==
      Seq("dim_crop", "dim_location", "dim_soil", "fact_crop_suitability",
        "fact_soil", "fact_weather"))
    assert(rs.count(_.isInstanceOf[RangeRule]) >= 10)
    assert(rs.exists(_.isInstanceOf[UniqueRule]))
    assert(rs.exists(_.isInstanceOf[GateRule]))
    assert(rs.exists(_.isInstanceOf[AnomalyRule]))
  }
}
