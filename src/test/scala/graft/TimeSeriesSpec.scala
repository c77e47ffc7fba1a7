package graft

import java.sql.Date
import graft.analytics.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: (String, String, Long)*) =
    rows.map { case (g, d, y) => (g, Date.valueOf(d), y) }
      .toDF("g", "day", "yc")

  test("dowSeasonality: constant series has zero seasonality") {
    // 14 consecutive days, constant 100 cents: every full window's
    // detrended value is 0
    val rows = (1 to 14).map(i =>
      ("a", f"2024-01-$i%02d", 100L))
    val got = TimeSeries.dowSeasonality(daily(rows: _*), "g", "day", "yc")
      .select("dow", "seasonal").as[(Int, Double)].collect().toMap
    assert(got.size === 7)
    assert(got.values.forall(_ === 0.0))
  }

  test("dowSeasonality: a weekly spike surfaces on its weekday") {
    // 21 days of 0 except +700 every Monday (Jan 1/8/15 2024 are Mondays)
    val rows = (1 to 21).map { i =>
      val d = f"2024-01-$i%02d"
      ("a", d, if (i % 7 == 1) 700L else 0L)
    }
    val got = TimeSeries.dowSeasonality(daily(rows: _*), "g", "day", "yc")
      .select("dow", "seasonal").as[(Int, Double)].collect().toMap
    // Monday (dow 1) seasonal must be the unique maximum, positive
    assert(got(1) === got.values.max)
    assert(got(1) > 0.0)
    // windows all contain exactly one spike: non-Monday days are
    // below trend by the same amount
    assert(got.collect { case (k, v) if k != 1 => v }.toSet.size === 1)
  }

  test("dowSeasonality: edge rows without a full window are excluded") {
    val rows = (1 to 8).map(i => ("a", f"2024-01-$i%02d", 100L))
    val got = TimeSeries.dowSeasonality(daily(rows: _*), "g", "day", "yc")
      .agg(org.apache.spark.sql.functions.sum("n_days"))
      .as[Long].collect()(0)
    // 8 days, rows 4..5 are the only ones with 3 before and 3 after
    assert(got === 2L)
  }

  test("seasonalAnomalies: constant series flags nothing") {
    val rows = (1 to 28).map(i => ("a", f"2024-01-$i%02d", 100L))
    val got = TimeSeries.seasonalAnomalies(
      daily(rows: _*), "g", "day", "yc")
    assert(got.count() === 0L)
  }

  test("seasonalAnomalies: a one-day spike is flagged") {
    val rows = (1 to 28).map { i =>
      ("a", f"2024-01-$i%02d", if (i == 15) 100000L else 100L)
    }
    val got = TimeSeries.seasonalAnomalies(
        daily(rows: _*), "g", "day", "yc")
      .collect()
    val days = got.map(_.getAs[String]("day")).toSet
    assert(days.contains("2024-01-15"), s"flagged=$days")
    // only the spike and its window/dow-contaminated neighbors can
    // trip the gate — never the bulk of the series
    assert(got.length < 10, s"flagged=${days.toSeq.sorted}")
  }

  test("seasonalAnomalies: partitioning-insensitive") {
    val rows = (1 to 28).map { i =>
      ("a", f"2024-01-$i%02d", if (i == 15) 100000L else 100L + i)
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.seasonalAnomalies(df, "g", "day", "yc")
        .collect().map(_.toString).toSeq
    val base = daily(rows: _*)
    assert(run(base) === run(base.repartition(11)))
  }

  test("cusumChangePoint: locates a level shift, earliest on ties") {
    // 6 days: 100,100,100,200,200,200 -> max |S_k| at day 3
    val rows = Seq(
      ("a", "2024-01-01", 100L), ("a", "2024-01-02", 100L),
      ("a", "2024-01-03", 100L), ("a", "2024-01-04", 200L),
      ("a", "2024-01-05", 200L), ("a", "2024-01-06", 200L))
    val r = TimeSeries.cusumChangePoint(daily(rows: _*), "g", "day", "yc")
      .collect()(0)
    assert(r.getAs[String]("change_day") === "2024-01-03")
    // S_3 = 3*(100-150) = -150 cents -> 1.5 units
    assert(r.getAs[Double]("cusum_stat") === 1.5)
    assert(r.getAs[Long]("n_days") === 6L)
  }

  test("cusumChangePoint: groups are independent") {
    val rows = Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 1000L),
      ("b", "2024-01-01", 1000L), ("b", "2024-01-02", 0L))
    val got = TimeSeries.cusumChangePoint(daily(rows: _*), "g", "day", "yc")
      .select("g", "change_day").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "2024-01-01", "b" -> "2024-01-01"))
  }
}
