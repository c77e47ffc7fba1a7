package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Time-series reshaping: gap-filled resampling (grid generation +
  * forward fill) and pivot-to-wide — standard feature-engineering
  * shapes over event streams. Both stay key-partitioned: the grid is
  * generated per key with `sequence`, never materialized globally.
  */
object TimeSeriesQueries {

  /** Shared daily series: per-(type, day) value totals in exact
    * cents — the input grain for the seasonal/change-point ops. */
  private def dailyCents(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "events")
      .where(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg((sum(Q.dec(col("value"))) * 100).cast("long").as("yc"))

  val all: Seq[Q] = Seq(

    // Time-decayed part popularity (90-day half-life from the
    // newest ship date): the freshness-weighted ranking feature.
    // Each row's exp(-λ·age) weight is quantized to 1e-12 units
    // (libm exp last-ulp differences) and summed exactly; top-50 by
    // (score, part).
    {
      val lam = graft.analytics.TimeSeries.lambdaFor(90.0)
      Q("q205_decayed_popularity", Some(s"""
      WITH mx AS (
        SELECT MAX(CAST(l_shipdate AS DATE)) AS md FROM lineitem
        WHERE l_shipdate IS NOT NULL),
      r AS (
        SELECT l_partkey AS k,
          date_diff('day', CAST(l_shipdate AS DATE), md) AS age
        FROM lineitem CROSS JOIN mx
        WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL),
      c AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(SUM(CAST(round(exp(-$lam * CAST(age AS DOUBLE))
            * 1000000000000.0) AS HUGEINT)) AS BIGINT) AS score_fp
        FROM r WHERE age >= 0 GROUP BY k)
      SELECT CAST(k AS BIGINT) AS key, n_rows, score_fp
      FROM c ORDER BY score_fp DESC, key LIMIT 50""")) { (s, dir) =>
        val li = Tables.load(s, dir, "lineitem")
          .where(col("l_partkey").isNotNull &&
            col("l_shipdate").isNotNull)
        val mx = li.agg(max(to_date(col("l_shipdate"))).as("md"))
        graft.analytics.TimeSeries.decayedCounts(
          li.crossJoin(broadcast(mx))
            .select(col("l_partkey").as("key"),
              datediff(col("md"), to_date(col("l_shipdate")))
                .cast("long").as("age")),
          "key", "age", halfLifeDays = 90.0, k = 50)
      }
    },

    // MASE of the seasonal-naive (lag-7) forecast per event type:
    // the scale-free "does my forecast beat naive" number. Error
    // series stay exact BIGINT cents summed as HUGEINT; the two MAEs
    // and their ratio are the only double ops, shaped identically in
    // both engines.
    Q("q199_mase", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), e AS (
        SELECT event_type,
          abs(yc - lag(yc, 7) OVER w) AS es,
          abs(yc - lag(yc, 1) OVER w) AS e1
        FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
      SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_days,
        CASE WHEN count(es) > 0 THEN
          CAST(SUM(CAST(es AS HUGEINT)) AS DOUBLE) /
            CAST(count(es) AS DOUBLE) END AS mae_seasonal,
        CASE WHEN count(e1) > 0 THEN
          CAST(SUM(CAST(e1 AS HUGEINT)) AS DOUBLE) /
            CAST(count(e1) AS DOUBLE) END AS mae_naive,
        CASE WHEN count(es) > 0 AND SUM(e1) > 0 THEN
          (CAST(SUM(CAST(es AS HUGEINT)) AS DOUBLE) /
            CAST(count(es) AS DOUBLE)) /
          (CAST(SUM(CAST(e1 AS HUGEINT)) AS DOUBLE) /
            CAST(count(e1) AS DOUBLE)) END AS mase
      FROM e GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      graft.analytics.TimeSeries.maseSeasonalNaive(
        dailyCents(s, dir), "event_type", "day", "yc", season = 7)
    },

    // Split-conformal coverage of the lag-7 naive band: the first 10
    // scorable residuals per type set the 0.8-quantile |error| band
    // (exact interpolated percentile, the q47 contract), the rest
    // test it — the alert-threshold calibration audit.
    Q("q200_conformal", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), r AS (
        SELECT event_type, day,
          abs(yc - lag(yc, 7) OVER (
            PARTITION BY event_type ORDER BY day)) AS rr
        FROM d
      ), rr2 AS (
        SELECT event_type, rr, row_number() OVER (
            PARTITION BY event_type ORDER BY day) AS rn
        FROM r WHERE rr IS NOT NULL
      ), qh AS (
        SELECT event_type, quantile_cont(CAST(rr AS DOUBLE), 0.8)
          AS qhat
        FROM rr2 WHERE rn <= 10 GROUP BY 1
      ), t AS (
        SELECT rr2.event_type, rr, qhat
        FROM rr2 JOIN qh USING (event_type) WHERE rn > 10)
      SELECT event_type AS g, MIN(qhat) AS qhat,
        CAST(count(*) AS BIGINT) AS n_test,
        CAST(SUM(CASE WHEN rr <= qhat THEN 1 ELSE 0 END) AS BIGINT)
          AS n_covered,
        CAST(SUM(CASE WHEN rr <= qhat THEN 1 ELSE 0 END) AS DOUBLE) /
          CAST(count(*) AS DOUBLE) AS coverage
      FROM t GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      graft.analytics.TimeSeries.conformalCoverage(
        dailyCents(s, dir), "event_type", "day", "yc",
        season = 7, calibDays = 10, q = 0.8)
    },

    // Day-of-week seasonal decomposition (classical additive /
    // STL moving-average step): trend = centered 7-row MA over the
    // per-type daily series, seasonal = per-DOW mean of the
    // detrended values — kept RATIONAL (7·y − Σwindow in exact
    // cents) until one final division, so it hash-matches.
    Q("q143_dow_seasonality", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), t AS (
        SELECT event_type, day, yc,
          count(*) OVER w AS wn,
          sum(CAST(yc AS HUGEINT)) OVER w AS ws
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      )
      SELECT event_type, CAST(isodow(day) AS INT) AS dow,
        CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(7 * CAST(yc AS HUGEINT) - ws) AS DOUBLE)
          / (700.0 * CAST(count(*) AS DOUBLE)) AS seasonal
      FROM t WHERE wn = 7
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      graft.analytics.TimeSeries.dowSeasonality(
        dailyCents(s, dir), "event_type", "day", "yc")
    },

    // Seasonal-adjusted anomaly days: detrend (7-day centered MA,
    // exact 7·y−Σwin integers), remove the per-DOW seasonal (rounded
    // mean — one division+round), Hampel-gate the integer residuals
    // (interpolated median/MAD, fixed multiply order) — flags days
    // deviating from their own weekday's norm, not every Saturday.
    Q("q168_seasonal_anomalies", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), t AS (
        SELECT event_type, day, yc,
          count(*) OVER w AS wn,
          sum(CAST(yc AS HUGEINT)) OVER w AS ws
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      ), det AS (
        SELECT event_type, day, yc,
          CAST(7 * CAST(yc AS HUGEINT) - ws AS BIGINT) AS det,
          CAST(isodow(day) AS INT) AS dow
        FROM t WHERE wn = 7
      ), seas AS (
        SELECT event_type, dow,
          CAST(round(CAST(sum(CAST(det AS HUGEINT)) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS sd
        FROM det GROUP BY 1, 2
      ), r AS (
        SELECT d.event_type, d.day, d.yc, d.det - s.sd AS r
        FROM det d JOIN seas s USING (event_type, dow)
      ), med AS (
        SELECT event_type, quantile_cont(r, 0.5) AS med
        FROM r GROUP BY 1
      ), dev AS (
        SELECT r.event_type, r.day, r.yc, r.r, m.med,
          abs(CAST(r.r AS DOUBLE) - m.med) AS dv
        FROM r JOIN med m USING (event_type)
      ), mad AS (
        SELECT event_type, med, quantile_cont(dv, 0.5) AS mad
        FROM dev GROUP BY 1, 2
      )
      SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
        CAST(d.yc AS BIGINT) AS yc,
        CAST(d.r AS BIGINT) AS residual, m.med, m.mad
      FROM dev d JOIN mad m USING (event_type)
      WHERE d.dv > (m.mad * 1.4826) * 2.0
      ORDER BY event_type, day""")) { (s, dir) =>
      graft.analytics.TimeSeries.seasonalAnomalies(
        dailyCents(s, dir), "event_type", "day", "yc", k = 2.0)
    },

    // Holt linear (double exponential) smoothing per type over the
    // daily series: level/trend recursion as an explicit day-ordered
    // left fold (identical IEEE chain in `aggregate` ↔ `list_reduce`,
    // the q116 EWMA pattern with a two-field struct accumulator),
    // init l₁=y₁, b₁=y₂−y₁ (Hyndman §7.2), 7-day-ahead forecast
    // ŷ = l + 7b. α=0.5, β=0.3.
    Q("q156_holt_forecast", Some("""
      WITH RECURSIVE d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
            AS BIGINT) AS DOUBLE) / 100.0 AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), v AS (
        SELECT event_type, list(y ORDER BY day) AS ys,
          CAST(count(*) AS BIGINT) AS n_days
        FROM d GROUP BY 1 HAVING count(*) >= 2
      ), it AS (
        -- NB: a list_reduce fold with a multi-field struct
        -- accumulator mis-evaluates in DuckDB v1.0 (the second
        -- field sees a half-updated accumulator); the recursive CTE
        -- below has well-defined semantics and runs the identical
        -- IEEE chain
        SELECT event_type, 2 AS k, ys[1] AS l, ys[2] - ys[1] AS b,
          ys, n_days
        FROM v
        UNION ALL
        SELECT event_type, k + 1,
          0.5::DOUBLE * ys[k] + 0.5::DOUBLE * (l + b),
          0.3::DOUBLE * ((0.5::DOUBLE * ys[k]
            + 0.5::DOUBLE * (l + b)) - l) + 0.7::DOUBLE * b,
          ys, n_days
        FROM it WHERE k <= n_days
      )
      SELECT event_type, n_days, l AS level, b AS trend,
        l + 7.0::DOUBLE * b AS forecast_7d
      FROM it WHERE k = n_days + 1
      ORDER BY event_type""")) { (s, dir) =>
      val d = dailyCents(s, dir)
        .select(col("event_type"), col("day"),
          (col("yc").cast("double") / lit(100.0)).as("y"))
      val v = d.groupBy("event_type")
        .agg(transform(
            sort_array(collect_list(struct(col("day"), col("y")))),
            x => x.getField("y")).as("ys"),
          count(lit(1)).as("n_days"))
        .where(col("n_days") >= 2)
      def l2(acc: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) =
        lit(0.5) * x + lit(0.5) *
          (acc.getField("l") + acc.getField("b"))
      val folded = v.select(col("event_type"), col("n_days"),
        aggregate(
          slice(col("ys"), lit(2),
            greatest(size(col("ys")) - 1, lit(0))),
          struct(element_at(col("ys"), 1).as("l"),
            (element_at(col("ys"), 2) - element_at(col("ys"), 1))
              .as("b")),
          (acc, x) => struct(
            l2(acc, x).as("l"),
            (lit(0.3) * (l2(acc, x) - acc.getField("l")) +
              lit(0.7) * acc.getField("b")).as("b"))).as("st"))
      folded.select(col("event_type"), col("n_days"),
          col("st.l").as("level"), col("st.b").as("trend"),
          (col("st.l") + lit(7.0) * col("st.b")).as("forecast_7d"))
        .orderBy("event_type")
    },

    // Trailing 14-day rolling correlation between the view and
    // purchase daily value series — the co-movement diagnostic.
    // Exact windowed power sums; the unpartitioned window is safe
    // because the input is day-grain (calendar-bounded).
    Q("q151_rolling_corr", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND event_type IN ('view', 'purchase')
        GROUP BY 1, 2
      ), s AS (
        SELECT v.day, v.yc AS x, p.yc AS y
        FROM (SELECT day, yc FROM d WHERE event_type = 'view') v
        JOIN (SELECT day, yc FROM d WHERE event_type = 'purchase') p
          USING (day)
      ), r AS (
        SELECT day,
          count(*) OVER w AS n,
          sum(CAST(x AS HUGEINT)) OVER w AS sx,
          sum(CAST(y AS HUGEINT)) OVER w AS sy,
          sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
          sum(CAST(y AS HUGEINT) * y) OVER w AS syy,
          sum(CAST(x AS HUGEINT) * y) OVER w AS sxy
        FROM s
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
      )
      SELECT strftime(day, '%Y-%m-%d') AS day,
        CASE WHEN CAST(14 * sxx - sx * sx AS DOUBLE) > 0
              AND CAST(14 * syy - sy * sy AS DOUBLE) > 0 THEN
          CAST(14 * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(14 * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(14 * syy - sy * sy AS DOUBLE))) END AS corr
      FROM r WHERE n = 14 ORDER BY day""")) { (s, dir) =>
      val d = dailyCents(s, dir)
        .where(col("event_type").isin("view", "purchase"))
      val joined = d.where(col("event_type") === "view")
        .select(col("day"), col("yc").as("x"))
        .join(d.where(col("event_type") === "purchase")
          .select(col("day"), col("yc").as("y")), Seq("day"))
      graft.analytics.TimeSeries.rollingCorr(
          joined, "day", "x", "y", window = 14)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("corr"))
        .orderBy("day")
    },

    // CUSUM change-point scan: the day maximizing |Σ_{i<=k}(y_i - mean)|
    // per type (Page 1954), located in exact integer arithmetic
    // (n·S_k = n·C_k − k·T in cents — the mean never becomes a
    // double), earliest day on ties.
    Q("q144_cusum_changepoint", Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
      ), s AS (
        SELECT event_type, day,
          CAST(row_number() OVER wo AS HUGEINT) AS k,
          sum(CAST(yc AS HUGEINT)) OVER wc AS c,
          CAST(count(*) OVER wa AS HUGEINT) AS n,
          sum(CAST(yc AS HUGEINT)) OVER wa AS t
        FROM d
        WINDOW wo AS (PARTITION BY event_type ORDER BY day),
          wc AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wa AS (PARTITION BY event_type)
      ), z AS (
        SELECT event_type, day, n,
          abs(n * c - k * t) AS ns,
          row_number() OVER (PARTITION BY event_type
            ORDER BY abs(n * c - k * t) DESC, day) AS rnk
        FROM s
      )
      SELECT event_type, CAST(n AS BIGINT) AS n_days,
        strftime(day, '%Y-%m-%d') AS change_day,
        CAST(ns AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
          AS cusum_stat
      FROM z WHERE rnk = 1 ORDER BY event_type""")) { (s, dir) =>
      graft.analytics.TimeSeries.cusumChangePoint(
        dailyCents(s, dir), "event_type", "day", "yc")
    },

    // Hourly resample per user (users 0..9 for output size): one row
    // per user per hour between the user's first and last event, value
    // = last observation carried forward.
    Q("q49_gap_fill", Some("""
      WITH bounds AS (
        SELECT user_id,
          date_trunc('hour', min(ts)) AS h0,
          date_trunc('hour', max(ts)) AS h1
        FROM events WHERE user_id < 10 GROUP BY user_id),
      grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds),
      hourly AS (
        SELECT user_id, hour, value AS hour_value FROM (
          SELECT user_id, date_trunc('hour', ts) AS hour, value,
            ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE user_id < 10) t
        WHERE rn = 1)
      SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
        CAST(hour_value IS NOT NULL AS BOOLEAN) AS observed,
        last_value(hour_value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
      FROM grid LEFT JOIN hourly USING (user_id, hour)
      ORDER BY user_id, hour""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events").filter(col("user_id") < 10)
      val bounds = e.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
      val grid = bounds.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
      val wLast = Window.partitionBy("user_id", "hour")
        .orderBy(col("ts").desc, col("event_id").desc)
      val hourly = e
        .withColumn("hour", date_trunc("hour", col("ts")))
        .withColumn("__rn", row_number().over(wLast))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("hour"), col("value").as("hour_value"))
      val wFF = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"),
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("hour_value").isNotNull.as("observed"),
          last(col("hour_value"), ignoreNulls = true).over(wFF)
            .as("value_ff"))
        .orderBy("user_id", "hour")
    },

    // Pivot event types to wide per user decile: per-type counts and
    // exact decimal sums as columns (generated identically as CASE
    // aggregations in the oracle).
    {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val duckCols = types.map { t =>
        s"""CAST(COUNT(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t,
           |CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = '$t') AS DOUBLE) AS sum_$t"""
          .stripMargin
      }.mkString(",\n        ")
      Q("q50_pivot", Some(s"""
      SELECT CAST(user_id % 10 AS BIGINT) AS user_decile,
        $duckCols
      FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
        val e = Tables.load(s, dir, "events")
        val aggs = types.flatMap { t =>
          Seq(
            count(when(col("event_type") === t, 1)).as(s"n_$t"),
            sum(when(col("event_type") === t,
              col("value").cast(DecimalType(18, 2)))).cast("double")
              .as(s"sum_$t"))
        }
        e.groupBy((col("user_id") % 10).as("user_decile"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy("user_decile")
      }
    },

    // EWMA smoothing + deviation flags per user stream (the classic
    // sensor-series anomaly shape — cf. the reference's temperature
    // spike rule, WN1). The recursion EWMA_t = αx_t + (1-α)EWMA_{t-1}
    // over the last 16 observations is computed as an explicit LEFT
    // FOLD over the ordered window list — `aggregate` in Spark,
    // `list_reduce` in DuckDB — so both engines run the identical
    // IEEE op sequence (no pow/exp, no quantization needed) and the
    // raw doubles hash-match. Key-partitioned window: no global sort,
    // scales per user at 100 TB.
    Q("q116_ewma", Some("""
      WITH e AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE user_id < 20 AND value IS NOT NULL),
      w AS (
        SELECT event_id, user_id, ts, value,
          list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
        FROM e)
      SELECT event_id, user_id, ts, value, ewma,
        (abs(value - ewma) > 60.0) AS is_spike
      FROM (
        SELECT event_id, user_id,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
          list_reduce(vals, (acc, x) -> (0.25*x) + (0.75*acc)) AS ewma
        FROM w)
      ORDER BY event_id""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .filter(col("user_id") < 20 && col("value").isNotNull)
        .select("event_id", "user_id", "ts", "value")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-15, Window.currentRow)
      e.withColumn("__vals", collect_list(col("value")).over(w))
        .withColumn("ewma",
          graft.analytics.TimeSeries.ewmaFold(col("__vals"), alpha = 0.25))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value"), col("ewma"),
          (abs(col("value") - col("ewma")) > 60.0).as("is_spike"))
        .orderBy("event_id")
    },

    // Mann–Kendall trend test + Theil–Sen slope per event type: the
    // distribution-free "is this daily series drifting?" answer. S and
    // the tie-correction term are exact integer sums over cents; z and
    // the rank-selected median pairwise slope are fixed double chains
    // shaped identically in both engines (middle ranks via integer-
    // safe floor((m+1)/2) / floor((m+2)/2) so even pair counts average
    // BOTH middle slopes). Pairwise stage is O(days²) per group —
    // calendar-bounded, independent of row volume.
    Q("q230_mann_kendall", Some("""
      WITH d AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2),
      p AS (
        SELECT a.g,
          CASE WHEN b.yc > a.yc THEN 1
               WHEN b.yc < a.yc THEN -1 ELSE 0 END AS sgn,
          (CAST(b.yc - a.yc AS DOUBLE) / 100.0)
            / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        FROM d a JOIN d b ON a.g = b.g AND a.day < b.day),
      sa AS (
        SELECT g, CAST(SUM(sgn) AS BIGINT) AS s,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM p GROUP BY g),
      nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY g),
      tt AS (
        SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tc
        FROM (SELECT g, yc, CAST(count(*) AS BIGINT) AS t
              FROM d GROUP BY g, yc)
        GROUP BY g),
      sen AS (
        SELECT g, SUM(slope) / count(*) AS sen_slope FROM (
          SELECT g, slope,
            row_number() OVER (PARTITION BY g ORDER BY slope) AS rn,
            count(*) OVER (PARTITION BY g) AS m
          FROM p)
        WHERE rn = CAST(floor(CAST(m + 1 AS DOUBLE) / 2.0) AS BIGINT)
           OR rn = CAST(floor(CAST(m + 2 AS DOUBLE) / 2.0) AS BIGINT)
        GROUP BY g),
      v AS (
        SELECT nd.g, nd.n, sa.n_pairs, sa.s, sen.sen_slope,
          CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - tt.tc AS DOUBLE)
            / 18.0 AS var_s
        FROM nd JOIN tt ON nd.g = tt.g JOIN sa ON nd.g = sa.g
          JOIN sen ON nd.g = sen.g)
      SELECT g, n AS n_days, n_pairs, s, var_s,
        CASE WHEN var_s <= 0 THEN NULL
             WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
             WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
             ELSE 0.0 END AS z,
        sen_slope
      FROM v ORDER BY g""")) { (s, dir) =>
      graft.analytics.TimeSeries.mannKendall(
        dailyCents(s, dir), "event_type", "day", "yc")
    }
  )
}
