package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}
import graft.Tables
import graft.analytics.{AsOfJoin, JoinOps, RangeJoin}
import graft.warehouse.SkewJoin

/** Advanced operator tier: semi-structured JSON columns, rollup
  * grouping sets, batch sliding windows, as-of joins, and binned range
  * joins — each with a DuckDB oracle (DuckDB's native ASOF JOIN and
  * inequality joins verify our scale-path rewrites row-for-row).
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(

    // Semi-structured props column (JSONB analogue, SURVEY §1.2):
    // typed from_json parse, bucket aggregation. Oracle extracts the
    // field with a regex so it needs no JSON extension — values match
    // the real JSON parse because props is canonical {"k": N}.
    Q("q41_props_json", Some("""
      SELECT CAST(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS INT) AS k_bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        CAST(MIN(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS INT) AS min_k,
        CAST(MAX(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS INT) AS max_k
      FROM events
      GROUP BY 1 ORDER BY k_bucket""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val k = from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType)))).getField("k")
      e.select(k.as("k"), col("value"))
        .groupBy((col("k") % 10).cast("int").as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("k_bucket")
    },

    // ROLLUP grouping sets with grouping_id — subtotals and grand
    // total in one pass (partial aggregation per grouping set).
    Q("q42_rollup", Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) {
      (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(10, 2))).cast("double")
            .as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Longest consecutive-day activity streak per user — islands over
    // the TIME dimension (q160 audits the key domain): distinct active
    // days, the date-minus-row_number island key, one keyed count.
    // Every window partitions by user_id, so there is no global sort
    // and the shape scales as two keyed shuffles. All-integer/date
    // semantics — nothing floating-point to drift vs the oracle.
    Q("q162_activity_streaks", Some("""
      WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      ), g AS (
        SELECT user_id, d,
          d - CAST(ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
        FROM d
      ), s AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_days,
          MIN(d) AS sd, MAX(d) AS ed
        FROM g GROUP BY user_id, grp
      ), best AS (
        SELECT user_id, streak_days, sd, ed,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY streak_days DESC, sd) AS rk
        FROM s
      )
      SELECT user_id, streak_days,
        strftime(sd, '%Y-%m-%d') AS start_day,
        strftime(ed, '%Y-%m-%d') AS end_day
      FROM best WHERE rk = 1
      ORDER BY streak_days DESC, user_id LIMIT 20""")) { (s, dir) =>
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("d")
      val days = Tables.load(s, dir, "events")
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val streaks = days
        .withColumn("grp",
          date_sub(col("d"), row_number().over(wu)))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("streak_days"),
          min(col("d")).as("sd"), max(col("d")).as("ed"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(desc("streak_days"), asc("sd"))
      streaks.withColumn("rk", row_number().over(wb))
        .where(col("rk") === 1)
        .select(col("user_id"), col("streak_days"),
          date_format(col("sd"), "yyyy-MM-dd").as("start_day"),
          date_format(col("ed"), "yyyy-MM-dd").as("end_day"))
        .orderBy(desc("streak_days"), asc("user_id"))
        .limit(20)
    },

    // Top movers: week-over-week value deltas per event type, top-10
    // by absolute change — the period-over-period BI staple. Deltas
    // are exact cents; pct_change is one guarded double division.
    Q("q161_top_movers", Some("""
      WITH w AS (
        SELECT event_type, date_trunc('week', ts) AS wk,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS tc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), d AS (
        SELECT event_type, wk, tc,
          lag(tc) OVER (PARTITION BY event_type ORDER BY wk) AS pc
        FROM w
      )
      SELECT event_type, strftime(wk, '%Y-%m-%d') AS week,
        CAST(tc AS DOUBLE) / 100.0 AS total,
        CAST(pc AS DOUBLE) / 100.0 AS prev_total,
        CAST(tc - pc AS DOUBLE) / 100.0 AS delta,
        CASE WHEN pc > 0 THEN
          CAST(tc - pc AS DOUBLE) / CAST(pc AS DOUBLE) END
          AS pct_change
      FROM d WHERE pc IS NOT NULL
      ORDER BY abs(tc - pc) DESC, event_type, week
      LIMIT 10""")) { (s, dir) =>
      val w = Tables.load(s, dir, "events")
        .where(col("ts").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).as("wk"))
        .agg((sum(Q.dec(col("value"))) * 100).cast("long").as("tc"))
      val lw = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("wk")
      w.withColumn("pc", lag(col("tc"), 1).over(lw))
        .where(col("pc").isNotNull)
        .select(col("event_type"),
          date_format(col("wk"), "yyyy-MM-dd").as("week"),
          (col("tc").cast("double") / lit(100.0)).as("total"),
          (col("pc").cast("double") / lit(100.0)).as("prev_total"),
          ((col("tc") - col("pc")).cast("double") / lit(100.0))
            .as("delta"),
          when(col("pc") > 0,
            (col("tc") - col("pc")).cast("double") /
              col("pc").cast("double")).as("pct_change"),
          abs(col("tc") - col("pc")).as("__ad"))
        .orderBy(desc("__ad"), asc("event_type"), asc("week"))
        .limit(10)
        .drop("__ad")
    },

    // Gaps-and-islands: missing o_orderkey ranges, top-20 by length.
    // The engine runs the bucketed two-pass form (keyed within-bucket
    // lead + a per-bucket summary pass); the oracle is the textbook
    // global lead — identical gaps.
    Q("q160_id_gaps", Some("""
      WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
                 WHERE o_orderkey IS NOT NULL
                   AND o_orderstatus = 'F'),
      g AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
      SELECT CAST(k + 1 AS BIGINT) AS gap_start,
        CAST(nk - 1 AS BIGINT) AS gap_end,
        CAST(nk - k - 1 AS BIGINT) AS gap_len
      FROM g WHERE nk - k > 1
      ORDER BY gap_len DESC, gap_start LIMIT 20""")) { (s, dir) =>
      // bucketWidth 1000 so the cross-bucket boundary path runs in
      // anger even at the small verify SFs
      graft.analytics.Sequences.idGaps(
          Tables.load(s, dir, "orders")
            .where(col("o_orderstatus") === "F"), "o_orderkey",
          bucketWidth = 1000L)
        .orderBy(desc("gap_len"), asc("gap_start"))
        .limit(20)
    },

    // Full CUBE (all 2² grouping sets) with grouping-id parity —
    // completes the GROUPING SETS surface next to q42's ROLLUP.
    Q("q159_cube", Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
          AS gid,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total
      FROM orders
      GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority NULLS FIRST,
        o_orderstatus NULLS FIRST""")) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("total"))
        .select("o_orderpriority", "o_orderstatus", "gid", "n",
          "total")
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },

    // Batch sliding windows (1 h window / 30 min slide): every event
    // lands in exactly two windows; the oracle fans each row out to
    // both window starts arithmetically.
    Q("q43_sliding_window", Some("""
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM (
        SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts)
                         - INTERVAL '30 minutes']) AS ws,
          event_type, value
        FROM events)
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // As-of join: each error event picks up the latest prior click of
    // the same user. Our union+carry-forward rewrite (one key shuffle,
    // no range explosion) is verified against DuckDB's native
    // ASOF LEFT JOIN.
    Q("q44_asof_join", Some("""
      WITH clicks AS (
        SELECT user_id, ts, arg_max(event_id, event_id) AS click_id,
          arg_max(value, event_id) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts),
      errors AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'error')
      SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        e.value, c.click_id AS asof_click_id,
        c.click_value AS asof_click_value
      FROM errors e ASOF LEFT JOIN clicks c
        ON e.user_id = c.user_id AND e.ts >= c.ts
      ORDER BY e.event_id""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      val errors = e.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.lastPrior(errors, clicks, Seq("user_id"), "ts",
          Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value"), col("asof_click_id"), col("asof_click_value"))
        .orderBy("event_id")
    },

    // Range join: event values against overlapping brand-derived
    // value brackets. The binned equi-join rewrite is verified against
    // DuckDB's native inequality join.
    Q("q45_range_join", Some("""
      WITH brackets AS (
        SELECT p_brand, bn * 18.0 AS lo, bn * 18.0 + 30.0 AS hi
        FROM (SELECT DISTINCT p_brand,
                CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS bn
              FROM part))
      SELECT e.event_id, b.p_brand, e.value, b.lo
      FROM events e JOIN brackets b
        ON e.value >= b.lo AND e.value < b.hi
      ORDER BY event_id, p_brand""")) { (s, dir) =>
      val bn = regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int")
      val brackets = Tables.load(s, dir, "part")
        .select(col("p_brand")).distinct()
        .select(col("p_brand"), (bn * 18.0).as("lo"),
          (bn * 18.0 + 30.0).as("hi"))
      val events = Tables.load(s, dir, "events")
        .select("event_id", "value")
      RangeJoin.pointInInterval(events, brackets, "value", "lo", "hi",
          binWidth = 30.0)
        .select("event_id", "p_brand", "value", "lo")
        .orderBy("event_id", "p_brand")
    },

    // Semi-join reduction: a selective orders subset joins the full
    // lineitem — the Bloom pre-filter cuts the fact-side shuffle to
    // (match rate + fpp) BEFORE the exchange, and the exact equi-join
    // absorbs the false positives, so the oracle is the plain join.
    // At 100 TB this is the join shape where the dim side is selective
    // but too big to broadcast; the probe is a codegen'd native
    // expression, not a UDF, so it fuses into the scan stage.
    Q("q112_bloom_join", Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice > 400000
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      val dim = Tables.load(s, dir, "orders")
        .where(col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
      val fact = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val expected = math.max(1L, dim.count())
      JoinOps.bloomReduceJoin(fact, dim,
          col("l_orderkey"), col("o_orderkey"), expected)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), Q.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // Skew-salted join (warehouse.SkewJoin): lineitem × supplier on
    // (key, salt) with the small side replicated per salt — a hot
    // supplier's rows spread over `salts` reducers instead of one.
    // Result row-identical to the plain join (the oracle), salt
    // derived from a row hash so retries/speculation stay
    // deterministic.
    Q("q113_salted_join", Some("""
      SELECT s.s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS revenue
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey ORDER BY s_nationkey""")) { (s, dir) =>
      val big = Tables.load(s, dir, "lineitem")
        .select("l_suppkey", "l_extendedprice")
      val small = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      SkewJoin.saltedInnerJoin(big, small, Seq("l_suppkey"), buckets = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          Q.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("s_nationkey")
    },

    // Interval-OVERLAP join (brand value brackets × supplier capacity
    // windows): the binned rewrite emits each overlapping pair exactly
    // once — in the bin containing max(lo_a, lo_b) — so the plan is a
    // hash equi-join with no dedup pass, where the naive inequality
    // join nested-loops. Oracle is DuckDB's native inequality join.
    Q("q118_interval_join", Some("""
      WITH ai AS (
        SELECT p_brand, bn * 18.0 AS alo, bn * 18.0 + 30.0 AS ahi
        FROM (SELECT DISTINCT p_brand,
                CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS bn
              FROM part)),
      bi AS (
        SELECT s_suppkey, CAST(s_suppkey * 3 % 400 AS DOUBLE) AS blo,
          CAST(s_suppkey * 3 % 400 AS DOUBLE) + 25.0 AS bhi
        FROM supplier)
      SELECT p_brand, s_suppkey, alo, blo
      FROM ai JOIN bi ON alo < bhi AND blo < ahi
      ORDER BY p_brand, s_suppkey""")) { (s, dir) =>
      val bn = regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int")
      val ai = Tables.load(s, dir, "part")
        .select(col("p_brand")).distinct()
        .select(col("p_brand"), (bn * 18.0).as("alo"),
          (bn * 18.0 + 30.0).as("ahi"))
      val bi = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"),
          (col("s_suppkey") * 3 % 400).cast("double").as("blo"),
          ((col("s_suppkey") * 3 % 400).cast("double") + 25.0).as("bhi"))
      RangeJoin.intervalOverlap(ai, bi, "alo", "ahi", "blo", "bhi",
          binWidth = 30.0)
        .select("p_brand", "s_suppkey", "alo", "blo")
        .orderBy("p_brand", "s_suppkey")
    }
  )
}
