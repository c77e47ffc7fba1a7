package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.quality.{QualityConfig, QualitySuite}

/** The quality suite run as an engine query: a corpus-specific rule
  * document in the reference's `data-quality.yml` vocabulary, compiled
  * and executed over the corpus tables; the oracle recomputes every
  * rule's violation count in SQL.
  */
object QualityQueries {

  /** Rule document for the test corpus — same vocabulary as the
    * reference config (range/regex/enum/not_null/unique/cross/
    * referential/freshness/completeness/anomalies), with `date_column`
    * and per-table completeness `columns` as lake-specific extensions.
    */
  val corpusYaml: String = """
version: "1.0"
tables:
  events:
    not_null_columns: [event_id, ts, user_id]
    unique_columns: [event_id]
    validations:
      value:
        type: range
        min: 0.0
        max: 450.0
      event_type:
        type: enum
        values: [click, view, purchase, signup]
  customer:
    not_null_columns: [c_name]
    unique_columns: [c_custkey]
    validations:
      c_acctbal:
        type: range
        min: -999.99
        max: 9000.0
        critical: true
      c_mktsegment:
        type: regex
        pattern: "^[A-Z]{5,10}$"
  lineitem:
    cross_validations:
      - name: price_nonneg
        expression: "l_extendedprice >= 0"
        critical: true
      - name: ship_before_1999
        expression: "l_shipdate < TIMESTAMP '1999-01-01 00:00:00'"
referential_integrity:
  orders.o_custkey:
    references: customer.c_custkey
  lineitem.l_orderkey:
    references: orders.o_orderkey
freshness:
  orders:
    max_age_days: 30
    date_column: o_orderdate
completeness:
  events:
    threshold_percent: 99.0
    columns: [value, props]
anomalies:
  value_spike:
    table: events
    condition: "ABS(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 150"
    severity: warning
  value_extreme:
    table: events
    condition: "value < 1.0 OR value > 480.0"
    severity: critical
"""

  /** The reference's `custom_validations` block VERBATIM
    * (`.github/workflows/data-quality.yml:298-325`) — named SQL
    * validations the task requires matching, run over star-schema
    * views derived from the corpus tables. */
  val refCustomYaml: String = """
custom_validations:
  - name: "soil_texture_composition"
    description: "Clay + Sand + Silt should equal 100% (±5%)"
    sql: |
      SELECT location_key, extraction_date
      FROM dim_soil
      WHERE ABS((COALESCE(clay_content_0_5cm, 0) +
                 COALESCE(sand_content_0_5cm, 0) +
                 COALESCE(silt_content_0_5cm, 0)) - 100) > 5
    severity: warning

  - name: "crop_temperature_range"
    description: "Crop max temp should be greater than min temp"
    sql: |
      SELECT crop_key, crop_name
      FROM dim_crop
      WHERE temp_max_c <= temp_min_c
    severity: critical

  - name: "future_weather_data"
    description: "Weather data should not be from the future"
    sql: |
      SELECT location_key, date_key
      FROM fact_weather
      WHERE date_key > CURRENT_DATE
    severity: critical
"""

  /** Rule document exercising `monitoring.metrics`
    * (`data-quality.yml:327-341`): the reference's three metric
    * declarations verbatim, plus the `date_columns` lake extension
    * (the reference's runner knows each table's date column a priori)
    * and a completeness section feeding the score / completeness
    * metrics. Alert routing (`alerts:`) is operational and out of
    * scope. */
  val monitoringYaml: String = """
completeness:
  fact_soil:
    threshold_percent: 95.0
    columns: [moisture, ph]
  fact_weather:
    threshold_percent: 99.0
    columns: [temp_c]
monitoring:
  metrics:
    - name: "daily_record_count"
      tables: [fact_weather, fact_soil]
      schedule: "0 9 * * *"
      date_columns:
        fact_weather: date_key
        fact_soil: sample_date
    - name: "weekly_quality_score"
      schedule: "0 9 * * 1"
    - name: "monthly_completeness_report"
      schedule: "0 9 1 * *"
"""

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** dim_soil / dim_crop / fact_weather star views derived
    * deterministically from the corpus tables (integer arithmetic
    * only, so Spark and the DuckDB oracle agree bit-for-bit), with
    * violations of all three custom validations injected:
    * composition off by (p_partkey%15)-7 (violating when |Δ|>5, plus
    * null clay every 13th part), temp_max ⋚ temp_min as independent
    * moduli, and weather dates pushed up to 39 years forward. */
  private def starViews(s: SparkSession, dir: String)
      : Map[String, DataFrame] = {
    val part = Tables.load(s, dir, "part")
    val orders = Tables.load(s, dir, "orders")
    val dimSoil = part.select(
      col("p_partkey").as("location_key"),
      date_add(lit("2025-01-01").cast("date"),
        (col("p_partkey") % 28).cast("int")).as("extraction_date"),
      when(col("p_partkey") % 13 === 0, lit(null).cast("double"))
        .otherwise(((col("p_partkey") * 3) % 60).cast("double"))
        .as("clay_content_0_5cm"),
      ((col("p_size") * 7) % 60).cast("double")
        .as("sand_content_0_5cm"),
      (lit(100) - (col("p_partkey") * 3) % 60 -
        (col("p_size") * 7) % 60 + col("p_partkey") % 15 - 7)
        .cast("double").as("silt_content_0_5cm"))
    val dimCrop = part.select(
      col("p_partkey").as("crop_key"),
      col("p_name").as("crop_name"),
      (col("p_size") % 30).cast("double").as("temp_min_c"),
      (col("p_partkey") % 37).cast("double").as("temp_max_c"))
    val factWeather = orders.select(
      col("o_custkey").as("location_key"),
      date_add(col("o_orderdate").cast("date"),
        ((col("o_orderkey") % 40) * 365).cast("int")).as("date_key"),
      when(col("o_orderkey") % 17 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 45).cast("double"))
        .as("temp_c"))
    Map("dim_soil" -> dimSoil, "dim_crop" -> dimCrop,
      "fact_weather" -> factWeather)
  }

  val all: Seq[Q] = Seq(

    // One-query referential-integrity sweep over EVERY FK relation
    // in the star — the data-contract check as a single report
    // (per-relation row and orphan counts) instead of seven ad-hoc
    // anti-joins. Each relation is one keyed left join + aggregation;
    // the union is seven tiny rows.
    Q("q213_ri_sweep", Some("""
      SELECT 'customer.c_nationkey->nation' AS relation,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_orphans
      FROM customer c LEFT JOIN nation n
        ON c.c_nationkey = n.n_nationkey
      WHERE c.c_nationkey IS NOT NULL
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey
      WHERE l.l_orderkey IS NOT NULL
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_partkey IS NOT NULL
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s
        ON l.l_suppkey = s.s_suppkey
      WHERE l.l_suppkey IS NOT NULL
      UNION ALL
      SELECT 'nation.n_regionkey->region',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM nation n LEFT JOIN region r
        ON n.n_regionkey = r.r_regionkey
      WHERE n.n_regionkey IS NOT NULL
      UNION ALL
      SELECT 'orders.o_custkey->customer',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL
      UNION ALL
      SELECT 'supplier.s_nationkey->nation',
        CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT)
      FROM supplier s LEFT JOIN nation n
        ON s.s_nationkey = n.n_nationkey
      WHERE s.s_nationkey IS NOT NULL
      ORDER BY relation""")) { (s, dir) =>
      def check(child: String, fk: String, parent: String,
          pk: String): org.apache.spark.sql.DataFrame = {
        val c = Tables.load(s, dir, child).where(col(fk).isNotNull)
        val p = Tables.load(s, dir, parent).select(col(pk))
        c.join(p, c(fk) === p(pk), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(p(pk).isNull.cast("long")).as("n_orphans"))
          .select(lit(s"$child.$fk->$parent").as("relation"),
            col("n_rows"), col("n_orphans").cast("long"))
      }
      Seq(
        check("customer", "c_nationkey", "nation", "n_nationkey"),
        check("lineitem", "l_orderkey", "orders", "o_orderkey"),
        check("lineitem", "l_partkey", "part", "p_partkey"),
        check("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        check("nation", "n_regionkey", "region", "r_regionkey"),
        check("orders", "o_custkey", "customer", "c_custkey"),
        check("supplier", "s_nationkey", "nation", "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("relation")
    },

    // Population stability index — the ML-ops drift screen between a
    // reference window and a current window: o_totalprice bucketed
    // by the REFERENCE slice's deciles, per-bucket
    // (p_cur − p_ref)·ln(p_cur/p_ref) contributions. ln is quantized
    // to 4 decimals per this engine's libm-portability contract
    // (see RelevanceQueries scaladoc); a bucket absent from either
    // slice yields a null contribution rather than ±∞.
    Q("q147_psi_drift", Some("""
      WITH src AS (
        SELECT o_totalprice AS x,
          CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
               THEN 0 ELSE 1 END AS cur
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
      ), cuts AS (
        SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS cs
        FROM src WHERE cur = 0
      ), b AS (
        SELECT CAST(len(list_filter(cs, c -> x > c)) + 1 AS INT)
            AS bucket,
          cur
        FROM src, cuts
      ), g AS (
        SELECT bucket,
          CAST(sum(CASE WHEN cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_ref,
          CAST(sum(CASE WHEN cur = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cur
        FROM b GROUP BY 1
      ), t AS (
        SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM g
      )
      SELECT bucket, n_ref, n_cur,
        CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE) AS p_ref,
        CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE) AS p_cur,
        CASE WHEN n_ref > 0 AND n_cur > 0 THEN
          round_even(
            (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
             - CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))
            * ln((CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))
               / (CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))), 4)
        END AS psi4
      FROM g, t ORDER BY bucket""")) { (s, dir) =>
      val src = Tables.load(s, dir, "orders")
        .where(col("o_totalprice").isNotNull &&
          col("o_orderdate").isNotNull)
        .select(col("o_totalprice").as("x"),
          when(col("o_orderdate") <
            lit("1996-01-01").cast("timestamp"), 0)
            .otherwise(1).as("cur"))
      val cuts = src.where(col("cur") === 0)
        .agg(percentile(col("x"),
          array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cs"))
      val g = src.crossJoin(broadcast(cuts))
        .select((size(filter(col("cs"),
            c => col("x") > c)) + 1).cast("int").as("bucket"),
          col("cur"))
        .groupBy("bucket")
        .agg(sum(when(col("cur") === 0, 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("cur") === 1, 1L).otherwise(0L)).as("n_cur"))
      val tot = g.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
      val pRef = col("n_ref").cast("double") / col("tr").cast("double")
      val pCur = col("n_cur").cast("double") / col("tc").cast("double")
      g.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          pRef.as("p_ref"), pCur.as("p_cur"),
          when(col("n_ref") > 0 && col("n_cur") > 0,
            bround((pCur - pRef) * log(pCur / pRef), 4)).as("psi4"))
        .orderBy("bucket")
    },

    // k-anonymity audit over a quasi-identifier set (Sweeney 2002):
    // equivalence-class sizes for (nation, market segment), the
    // minimum class size (= the k the table actually provides), and
    // how much of the table sits in classes below the k=5 policy
    // line — the re-identification risk screen a training-data
    // governance pass runs before release.
    Q("q146_k_anonymity", Some("""
      WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
          CAST(count(*) AS BIGINT) AS sz
        FROM customer GROUP BY 1, 2
      )
      SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        CAST(count(*) AS BIGINT) AS n_classes,
        CAST(min(sz) AS BIGINT) AS k_anonymity,
        CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_classes_below5,
        CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
          AS n_rows_below5,
        CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          / CAST(sum(sz) AS DOUBLE) AS frac_rows_below5
      FROM cls""")) { (s, dir) =>
      val cls = Tables.load(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("sz"))
      cls.agg(
        sum(col("sz")).cast("long").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("sz")).cast("long").as("k_anonymity"),
        sum(when(col("sz") < 5, 1L).otherwise(0L))
          .as("n_classes_below5"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).cast("long")
          .as("n_rows_below5"))
        .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
          col("n_classes_below5"), col("n_rows_below5"),
          (col("n_rows_below5").cast("double") /
            col("n_rows").cast("double")).as("frac_rows_below5"))
    },

    // Benford first-digit audit (the forensic-accounting screen for
    // fabricated or truncated numeric columns): observed first-digit
    // distribution of l_extendedprice vs the Benford expectation,
    // with per-digit chi-square contributions. The first digit is
    // extracted from the INTEGER cents string (both engines print
    // integers identically; floats format differently), and the
    // Benford probabilities are shared literals generated from one
    // Scala source of truth — no libm log at query time.
    {
      val pExp = (1 to 9)
        .map(dd => dd -> math.log10(1.0 + 1.0 / dd)).toMap
      // string→double parse is correctly rounded in both engines; a
      // bare decimal literal would go through DuckDB DECIMAL first
      // and can land one ulp off the Scala double
      val sqlCase = (1 to 9).map { dd =>
        s"WHEN $dd THEN CAST('${pExp(dd)}' AS DOUBLE)"
      }.mkString(" ")
      Q("q145_benford", Some(s"""
      WITH b AS (
        SELECT CAST(substr(CAST(CAST(
            CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS VARCHAR), 1, 1) AS INT) AS digit
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 0.01
      ), g AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM b
        GROUP BY 1
      ), t AS (SELECT sum(n_obs) AS total FROM g)
      SELECT digit, n_obs,
        CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS p_obs,
        CASE digit $sqlCase END AS p_exp,
        (CAST(n_obs AS DOUBLE)
           - CAST(total AS DOUBLE) * (CASE digit $sqlCase END))
        * (CAST(n_obs AS DOUBLE)
           - CAST(total AS DOUBLE) * (CASE digit $sqlCase END))
        / (CAST(total AS DOUBLE) * (CASE digit $sqlCase END))
          AS chi_part
      FROM g, t ORDER BY digit""")) { (s, dir) =>
        val pCol = (1 to 9).foldLeft(lit(null).cast("double")) {
          (acc, dd) =>
            when(col("digit") === dd, lit(pExp(dd))).otherwise(acc)
        }
        val g = Tables.load(s, dir, "lineitem")
          .where(col("l_extendedprice").isNotNull &&
            col("l_extendedprice") >= 0.01)
          .select(substring(
            (Q.dec(col("l_extendedprice")) * 100).cast("long")
              .cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = g.agg(sum(col("n_obs")).as("total"))
        val nD = col("n_obs").cast("double")
        val tD = col("total").cast("double")
        g.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            (nD / tD).as("p_obs"), pCol.as("p_exp"),
            ((nD - tD * pCol) * (nD - tD * pCol) / (tD * pCol))
              .as("chi_part"))
          .orderBy("digit")
      }
    },

    Q("q36_quality_report", Some("""
      WITH r AS (
        SELECT 'anomaly_value_spike' AS rule_name, 'events' AS table_name,
          'warning' AS severity,
          (SELECT count(*) FROM (
             SELECT ABS(value - LAG(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) > 150 AS a FROM events) WHERE a)
            AS n_violations,
          (SELECT count(*) FROM events) AS n_rows
        UNION ALL SELECT 'anomaly_value_extreme', 'events', 'critical',
          (SELECT count(*) FROM (
             SELECT value < 1.0 OR value > 480.0 AS a FROM events) WHERE a),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'completeness_events_value', 'events', 'warning',
          (SELECT CASE WHEN count(value) * 100.0 / count(*) < 99.0
                  THEN 1 ELSE 0 END FROM events),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'completeness_events_props', 'events', 'warning',
          (SELECT CASE WHEN count(props) * 100.0 / count(*) < 99.0
                  THEN 1 ELSE 0 END FROM events),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'cross_lineitem_price_nonneg', 'lineitem',
          'critical',
          (SELECT count(*) FROM lineitem
           WHERE NOT COALESCE(l_extendedprice >= 0, FALSE)),
          (SELECT count(*) FROM lineitem)
        UNION ALL SELECT 'cross_lineitem_ship_before_1999', 'lineitem',
          'warning',
          (SELECT count(*) FROM lineitem
           WHERE NOT COALESCE(l_shipdate < TIMESTAMP '1999-01-01 00:00:00', FALSE)),
          (SELECT count(*) FROM lineitem)
        UNION ALL SELECT 'enum_events_event_type', 'events', 'warning',
          (SELECT count(*) FROM events WHERE event_type IS NOT NULL
           AND event_type NOT IN ('click', 'view', 'purchase', 'signup')),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'freshness_orders', 'orders', 'warning',
          (SELECT CASE WHEN datediff('day', CAST(max(o_orderdate) AS DATE),
                  DATE '2026-01-01') > 30 THEN 1 ELSE 0 END FROM orders),
          (SELECT count(*) FROM orders)
        UNION ALL SELECT 'not_null_events_event_id', 'events', 'critical',
          (SELECT count(*) FROM events WHERE event_id IS NULL),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'not_null_events_ts', 'events', 'critical',
          (SELECT count(*) FROM events WHERE ts IS NULL),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'not_null_events_user_id', 'events', 'critical',
          (SELECT count(*) FROM events WHERE user_id IS NULL),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'not_null_customer_c_name', 'customer', 'critical',
          (SELECT count(*) FROM customer WHERE c_name IS NULL),
          (SELECT count(*) FROM customer)
        UNION ALL SELECT 'range_events_value', 'events', 'warning',
          (SELECT count(*) FROM events WHERE value IS NOT NULL
           AND value NOT BETWEEN 0.0 AND 450.0),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'range_customer_c_acctbal', 'customer', 'critical',
          (SELECT count(*) FROM customer WHERE c_acctbal IS NOT NULL
           AND c_acctbal NOT BETWEEN -999.99 AND 9000.0),
          (SELECT count(*) FROM customer)
        UNION ALL SELECT 'regex_customer_c_mktsegment', 'customer',
          'warning',
          (SELECT count(*) FROM customer WHERE c_mktsegment IS NOT NULL
           AND NOT regexp_matches(c_mktsegment, '^[A-Z]{5,10}$')),
          (SELECT count(*) FROM customer)
        UNION ALL SELECT 'ri_orders_o_custkey', 'orders', 'error',
          (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
           AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
          (SELECT count(*) FROM orders)
        UNION ALL SELECT 'ri_lineitem_l_orderkey', 'lineitem', 'error',
          (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
           AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
          (SELECT count(*) FROM lineitem)
        UNION ALL SELECT 'unique_events_event_id', 'events', 'critical',
          (SELECT count(event_id) - count(DISTINCT event_id) FROM events),
          (SELECT count(*) FROM events)
        UNION ALL SELECT 'unique_customer_c_custkey', 'customer',
          'critical',
          (SELECT count(c_custkey) - count(DISTINCT c_custkey) FROM customer),
          (SELECT count(*) FROM customer))
      SELECT rule_name, table_name, severity,
        CAST(n_violations AS BIGINT) AS n_violations,
        CAST(n_rows AS BIGINT) AS n_rows,
        n_violations = 0 AS passed
      FROM r ORDER BY rule_name""")) { (s, dir) =>
      val tables = Seq("events", "customer", "lineitem", "orders")
        .map(t => t -> Tables.load(s, dir, t)).toMap
      val rules = QualityConfig.parse(corpusYaml)
      QualitySuite.report(s, tables, rules, lit("2026-01-01").cast("date"))
        .orderBy("rule_name")
    },

    // ETL gates (`etl_gates` section of data-quality.yml) evaluated
    // against a synthesized audit log (20 batches derived from events:
    // RUNNING at batch start, SUCCESS/FAILED at batch end, every 5th
    // batch missing its row count) plus two base rules feeding the
    // transform-phase meta-gates.
    Q("q56_etl_gates", Some("""
      WITH batches AS (
        SELECT event_id % 20 AS batch_id, min(ts) AS start_ts,
          max(ts) AS end_ts, count(*) AS n_events
        FROM events GROUP BY 1),
      lat AS (
        SELECT batch_id,
          CASE WHEN batch_id % 7 = 0 THEN 'FAILED'
               ELSE 'SUCCESS' END AS status,
          CASE WHEN batch_id % 5 = 0 THEN NULL ELSE n_events END AS records,
          (epoch_us(end_ts) - epoch_us(start_ts)) / 60000000.0 AS dur_min
        FROM batches),
      props_nulls AS (SELECT count(*) AS n FROM events WHERE props IS NULL),
      range_viol AS (
        SELECT count(*) AS n FROM events
        WHERE value IS NOT NULL AND value NOT BETWEEN 0.0 AND 350.0),
      r AS (
        SELECT 'not_null_events_props' AS rule_name,
          'events' AS table_name, 'critical' AS severity,
          (SELECT n FROM props_nulls) AS n_violations,
          (SELECT count(*) FROM events) AS n_rows
        UNION ALL SELECT 'range_events_value', 'events', 'critical',
          (SELECT n FROM range_viol), (SELECT count(*) FROM events)
        UNION ALL SELECT 'gate_extract_min_source_availability',
          'etl_audit_log', 'critical',
          (SELECT CASE WHEN SUM(CASE WHEN status <> 'RUNNING' THEN 1
             ELSE 0 END)::DOUBLE / count(*) < 0.95 THEN 1 ELSE 0 END
           FROM lat),
          (SELECT count(*) FROM lat)
        UNION ALL SELECT 'gate_extract_max_error_rate',
          'etl_audit_log', 'critical',
          (SELECT CASE WHEN SUM(CASE WHEN status = 'FAILED' THEN 1
             ELSE 0 END)::DOUBLE / count(*) > 0.1 THEN 1 ELSE 0 END
           FROM lat),
          (SELECT count(*) FROM lat)
        UNION ALL SELECT 'gate_load_min_rows_loaded',
          'etl_audit_log', 'critical',
          (SELECT count(*) FROM lat
           WHERE status = 'SUCCESS' AND COALESCE(records, 0) < 300),
          (SELECT count(*) FROM lat)
        UNION ALL SELECT 'gate_load_max_load_time_minutes',
          'etl_audit_log', 'critical',
          (SELECT count(*) FROM lat
           WHERE status <> 'RUNNING' AND dur_min > 10000),
          (SELECT count(*) FROM lat)
        UNION ALL SELECT 'gate_load_verify_row_count',
          'etl_audit_log', 'critical',
          (SELECT count(*) FROM lat
           WHERE status = 'SUCCESS' AND records IS NULL),
          (SELECT count(*) FROM lat)
        UNION ALL SELECT 'gate_transform_min_validation_pass_rate',
          'etl_audit_log', 'critical',
          (SELECT CASE WHEN (
             (CASE WHEN (SELECT n FROM props_nulls) = 0 THEN 1 ELSE 0 END) +
             (CASE WHEN (SELECT n FROM range_viol) = 0 THEN 1 ELSE 0 END)
             )::DOUBLE / 2 < 0.95 THEN 1 ELSE 0 END),
          2
        UNION ALL SELECT 'gate_transform_max_null_rate',
          'etl_audit_log', 'critical',
          (SELECT CASE WHEN (SELECT n FROM props_nulls)::DOUBLE /
             (SELECT count(*) FROM events) > 0.001 THEN 1 ELSE 0 END),
          (SELECT count(*) FROM events))
      SELECT rule_name, table_name, severity,
        CAST(n_violations AS BIGINT) AS n_violations,
        CAST(n_rows AS BIGINT) AS n_rows,
        n_violations = 0 AS passed
      FROM r ORDER BY rule_name""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val batches = ev.groupBy((col("event_id") % 20).as("batch_id"))
        .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
          count(lit(1)).as("n_events"))
      val running = batches.select(col("batch_id"),
        lit("agro_etl").as("pipeline_name"), lit("RUNNING").as("status"),
        col("start_ts").as("event_time"),
        lit(null).cast("long").as("records_processed"),
        lit(null).cast("string").as("error_message"))
      val terminal = batches.select(col("batch_id"),
        lit("agro_etl").as("pipeline_name"),
        when(col("batch_id") % 7 === 0, "FAILED").otherwise("SUCCESS")
          .as("status"),
        col("end_ts").as("event_time"),
        when(col("batch_id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("n_events")).as("records_processed"),
        when(col("batch_id") % 7 === 0, lit("load failed"))
          .otherwise(lit(null).cast("string")).as("error_message"))
      val audit = running.unionByName(terminal)
      val gatesYaml = """
tables:
  events:
    not_null_columns: [props]
    validations:
      value:
        type: range
        min: 0.0
        max: 350.0
        critical: true
etl_gates:
  extract:
    min_source_availability: 0.95
    max_error_rate: 0.1
  transform:
    min_validation_pass_rate: 0.95
    max_null_rate: 0.001
  load:
    min_rows_loaded: 300
    max_load_time_minutes: 10000
    verify_row_count: true
"""
      QualitySuite.report(s,
          Map("events" -> ev, "etl_audit_log" -> audit),
          QualityConfig.parse(gatesYaml), lit("2026-01-01").cast("date"))
        .orderBy("rule_name")
    },

    // The reference's three custom_validations run verbatim (their SQL
    // via spark.sql over the derived star views; CURRENT_DATE bound to
    // the suite's asOf date). Oracle re-derives the views as CTEs and
    // recomputes each violation count.
    Q("q74_custom_validations", Some("""
      WITH dim_soil AS (
        SELECT p_partkey AS location_key,
          CASE WHEN p_partkey % 13 = 0 THEN NULL
               ELSE CAST((p_partkey * 3) % 60 AS DOUBLE) END
            AS clay_content_0_5cm,
          CAST((p_size * 7) % 60 AS DOUBLE) AS sand_content_0_5cm,
          CAST(100 - (p_partkey * 3) % 60 - (p_size * 7) % 60
               + p_partkey % 15 - 7 AS DOUBLE) AS silt_content_0_5cm
        FROM part),
      dim_crop AS (
        SELECT p_partkey AS crop_key, p_name AS crop_name,
          CAST(p_size % 30 AS DOUBLE) AS temp_min_c,
          CAST(p_partkey % 37 AS DOUBLE) AS temp_max_c
        FROM part),
      fact_weather AS (
        SELECT o_custkey AS location_key,
          CAST(o_orderdate AS DATE)
            + CAST((o_orderkey % 40) * 365 AS INT) AS date_key
        FROM orders),
      r AS (
        SELECT 'custom_crop_temperature_range' AS rule_name,
          'dim_crop' AS table_name, 'critical' AS severity,
          (SELECT count(*) FROM dim_crop
           WHERE temp_max_c <= temp_min_c) AS n_violations,
          (SELECT count(*) FROM dim_crop) AS n_rows
        UNION ALL SELECT 'custom_future_weather_data', 'fact_weather',
          'critical',
          (SELECT count(*) FROM fact_weather
           WHERE date_key > DATE '2026-01-01'),
          (SELECT count(*) FROM fact_weather)
        UNION ALL SELECT 'custom_soil_texture_composition', 'dim_soil',
          'warning',
          (SELECT count(*) FROM dim_soil
           WHERE ABS((COALESCE(clay_content_0_5cm, 0) +
                      COALESCE(sand_content_0_5cm, 0) +
                      COALESCE(silt_content_0_5cm, 0)) - 100) > 5),
          (SELECT count(*) FROM dim_soil))
      SELECT rule_name, table_name, severity,
        CAST(n_violations AS BIGINT) AS n_violations,
        CAST(n_rows AS BIGINT) AS n_rows,
        n_violations = 0 AS passed
      FROM r ORDER BY rule_name""")) { (s, dir) =>
      QualitySuite.report(s, starViews(s, dir),
          QualityConfig.parse(refCustomYaml),
          lit("2026-01-01").cast("date"))
        .orderBy("rule_name")
    },

    // monitoring.metrics compiled and computed: per-day record counts,
    // the suite's pass-rate score, and per-column completeness
    // percentages (all double math is count arithmetic — exact and
    // engine-portable).
    Q("q76_monitoring_metrics", Some("""
      WITH fact_weather AS (
        SELECT o_custkey AS location_key,
          CAST(o_orderdate AS DATE)
            + CAST((o_orderkey % 40) * 365 AS INT) AS date_key,
          CASE WHEN o_orderkey % 17 = 0 THEN NULL
               ELSE CAST(o_orderkey % 45 AS DOUBLE) END AS temp_c
        FROM orders),
      fact_soil AS (
        SELECT l_suppkey AS location_key,
          CAST(l_shipdate AS DATE) AS sample_date,
          CASE WHEN l_orderkey % 11 = 0 THEN NULL
               ELSE CAST(l_linenumber AS DOUBLE) END AS moisture,
          CASE WHEN l_partkey % 29 = 0 THEN NULL
               ELSE 6.5 END AS ph
        FROM lineitem),
      m AS (
        SELECT 'daily_record_count' AS metric_name,
          'fact_weather' AS target, CAST(date_key AS VARCHAR) AS bucket,
          CAST(count(*) AS DOUBLE) AS metric_value
        FROM fact_weather GROUP BY date_key
        UNION ALL
        SELECT 'daily_record_count', 'fact_soil',
          CAST(sample_date AS VARCHAR), CAST(count(*) AS DOUBLE)
        FROM fact_soil GROUP BY sample_date
        UNION ALL
        SELECT 'weekly_quality_score', '(all)', '2026-01-01',
          CAST((CASE WHEN (SELECT CAST(count(moisture) AS DOUBLE) * 100.0
                           / count(*) FROM fact_soil) >= 95.0
                THEN 1 ELSE 0 END)
             + (CASE WHEN (SELECT CAST(count(ph) AS DOUBLE) * 100.0
                           / count(*) FROM fact_soil) >= 95.0
                THEN 1 ELSE 0 END)
             + (CASE WHEN (SELECT CAST(count(temp_c) AS DOUBLE) * 100.0
                           / count(*) FROM fact_weather) >= 99.0
                THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / 3
        UNION ALL
        SELECT 'monthly_completeness_report', 'fact_soil.moisture',
          '2026-01-01',
          (SELECT CAST(count(moisture) AS DOUBLE) * 100.0 / count(*)
           FROM fact_soil)
        UNION ALL
        SELECT 'monthly_completeness_report', 'fact_soil.ph',
          '2026-01-01',
          (SELECT CAST(count(ph) AS DOUBLE) * 100.0 / count(*)
           FROM fact_soil)
        UNION ALL
        SELECT 'monthly_completeness_report', 'fact_weather.temp_c',
          '2026-01-01',
          (SELECT CAST(count(temp_c) AS DOUBLE) * 100.0 / count(*)
           FROM fact_weather))
      SELECT metric_name, target, bucket, metric_value
      FROM m ORDER BY metric_name, target, bucket""")) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val factSoil = li.select(
        col("l_suppkey").as("location_key"),
        col("l_shipdate").cast("date").as("sample_date"),
        when(col("l_orderkey") % 11 === 0, lit(null).cast("double"))
          .otherwise(col("l_linenumber").cast("double")).as("moisture"),
        when(col("l_partkey") % 29 === 0, lit(null).cast("double"))
          .otherwise(lit(6.5)).as("ph"))
      val tables = Map(
        "fact_weather" -> starViews(s, dir)("fact_weather"),
        "fact_soil" -> factSoil)
      val rules = QualityConfig.parse(monitoringYaml)
      val defs = QualityConfig.parseMetrics(monitoringYaml)
      val asOf = lit("2026-01-01").cast("date")
      val rep = QualitySuite.report(s, tables, rules, asOf)
      QualitySuite.metrics(s, tables, defs, rules, rep, asOf)
        .orderBy("metric_name", "target", "bucket")
    }
  )
}
