package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Window/anomaly/windowed-aggregation queries over `events` — the
  * reference's declarative anomaly rules (SURVEY §2.7, WN1/WN2,
  * `.github/workflows/data-quality.yml:269-285`) plus batch tumbling
  * windows (§2.8). All windows partition by a key (user_id), so the
  * state is distributed; no single global sort anywhere.
  */
object EventQueries {
  import Q._

  val all: Seq[Q] = Seq(

    // WN1 temperature_spike analogue: |value - lag(value)| > threshold
    // per user ordered by time.
    Q("q06_value_spike", Some("""
      SELECT event_id, user_id, value, prev_value,
             value - prev_value AS delta
      FROM (SELECT event_id, user_id, value,
              lag(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_value
            FROM events) t
      WHERE abs(value - prev_value) > 150
      ORDER BY event_id""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      e.withColumn("prev_value", lag("value", 1).over(w))
        .filter(abs(col("value") - col("prev_value")) > 150)
        .select(col("event_id"), col("user_id"), col("value"),
          col("prev_value"),
          (col("value") - col("prev_value")).as("delta"))
        .orderBy("event_id")
    },

    // WN2 precipitation_outlier analogue: value > k × monthly per-user
    // mean. The mean is computed as exact-decimal sum / count so the
    // unordered window frame cannot introduce FP nondeterminism.
    Q("q07_monthly_outliers", Some("""
      SELECT event_id, user_id, m, value, avg_value
      FROM (SELECT event_id, user_id, CAST(month(ts) AS BIGINT) AS m, value,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_value
            FROM events
            WINDOW w AS (PARTITION BY user_id, month(ts))) t
      WHERE value > 2 * avg_value
      ORDER BY event_id""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), month(col("ts")))
      e.select(col("event_id"), col("user_id"),
          month(col("ts")).cast("long").as("m"), col("value"),
          (sum(col("value").cast(DecimalType(18, 2))).over(w)
            .cast("double") /
            count(lit(1)).over(w).cast("double")).as("avg_value"))
        .filter(col("value") > col("avg_value") * 2)
        .orderBy("event_id")
    },

    // Batch tumbling window (SURVEY §2.8): hourly per-type counts/sums.
    Q("q11_hourly_rollup", Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .orderBy("hour_start", "event_type")
    },

    // Completeness ratios (SURVEY A7): non-null fraction per column.
    Q("q13_completeness", Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(value) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS value_ratio,
        CAST(COUNT(event_type) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS event_type_ratio,
        CAST(COUNT(props) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS props_ratio
      FROM events""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.agg(count(lit(1)).as("n_rows"),
        (count(col("value")).cast("double") /
          count(lit(1)).cast("double")).as("value_ratio"),
        (count(col("event_type")).cast("double") /
          count(lit(1)).cast("double")).as("event_type_ratio"),
        (count(col("props")).cast("double") /
          count(lit(1)).cast("double")).as("props_ratio"))
    },

    // F9 temperature clean (°F heuristic + range gate) over event values
    // — scalar double math is unrounded so both engines emit identical
    // bits.
    Q("q17_clean_temperature", Some("""
      SELECT event_id, value,
        CASE WHEN v2 >= -50 AND v2 <= 60 THEN v2 ELSE NULL END AS temp_c
      FROM (SELECT event_id, value,
              CASE WHEN value > 60 THEN (value - 32) * 5.0 / 9.0
                   ELSE value END AS v2
            FROM events) t
      ORDER BY event_id""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.select(col("event_id"), col("value"),
          graft.functions.CleanFunctions.cleanTemperatureRaw(col("value"))
            .as("temp_c"))
        .orderBy("event_id")
    },

    // Ranking/frame window breadth (§2.7 beyond the reference's
    // lag/avg rules): percent_rank, cume_dist, ntile, lead,
    // first_value and an explicit ROWS-frame running decimal sum,
    // all over one deterministic total order (value, event_id — the
    // unique id breaks ties, so peer groups are singletons and every
    // rank function is reproducible).
    Q("q130_window_breadth", Some("""
      SELECT event_id, event_type, value,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        lead(value, 1) OVER w AS next_value,
        first_value(value) OVER w AS min_value,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY event_type ORDER BY value, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_sum
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_id""")) { (s, dir) =>
      val w = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"), col("value"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"),
          lead(col("value"), 1).over(w).as("next_value"),
          first_value(col("value")).over(w).as("min_value"),
          sum(col("value").cast(DecimalType(18, 2))).over(wf)
            .cast("double").as("running_sum"))
        .orderBy("event_id")
    }
  )
}
