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

  val all: Seq[Q] = Seq(

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
    }
  )
}
