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

  val all: Seq[Q] = Seq(
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
    }
  )
}
