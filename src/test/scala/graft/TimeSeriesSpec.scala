package graft

import java.sql.Date
import graft.analytics.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: (String, String, Long)*) =
    rows.map { case (g, d, y) => (g, Date.valueOf(d), y) }
      .toDF("g", "day", "yc")

  test("decayedCounts: half-life weights, exact ranking, negative " +
      "ages excluded") {
    import spark.implicits._
    // key a: ages 0 and 90 (one half-life) -> 1e12 + 5e11
    // key b: three at age 0 -> 3e12; key c: age -1 dropped entirely
    val rows = Seq(("a", 0L), ("a", 90L), ("b", 0L), ("b", 0L),
      ("b", 0L), ("c", -1L)).toDF("k", "age")
    val got = TimeSeries.decayedCounts(rows, "k", "age",
        halfLifeDays = 90.0, k = 10)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq("b", "a"))
    assert(got(0) === (("b", 3L, 3000000000000L)))
    val (_, na, sa) = got(1)
    assert(na === 2L)
    assert(math.abs(sa - 1500000000000L) <= 1)
  }

  test("maseSeasonalNaive: perfectly periodic series scores 0, " +
      "constant series nulls the ratio") {
    // period-2 series over 10 days: lag-2 error 0 everywhere, lag-1
    // error 100 -> mase 0
    val periodic = (1 to 10).map(i =>
      ("a", f"2024-01-$i%02d", if (i % 2 == 0) 200L else 100L))
    val got = TimeSeries.maseSeasonalNaive(
        daily(periodic: _*), "g", "day", "yc", season = 2)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val (_, n, es, e1, m) = got("a")
    assert(n === 10L && es === Some(0.0) && e1 === Some(100.0))
    assert(m === Some(0.0))
    // constant series: naive MAE 0 -> mase null
    val const = (1 to 6).map(i => ("b", f"2024-01-$i%02d", 50L))
    val g2 = TimeSeries.maseSeasonalNaive(
        daily(const: _*), "g", "day", "yc", season = 2)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()(0)
    assert(g2._3 === Some(0.0) && g2._5 === None)
  }

  test("conformalCoverage: hand-built residuals give the exact " +
      "interpolated band and test coverage") {
    // residuals after lag-1: calibration days 2..5 -> |diffs| from
    // the constructed series; q=0.5 median of {10,20,30,40} = 25;
    // test days 6..9 residuals {20,20,50,0} -> 3 of 4 covered
    val vals = Seq(0L, 10L, 30L, 60L, 100L, 120L, 140L, 190L, 190L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-01-${i + 1}%02d", v) }
    val got = TimeSeries.conformalCoverage(
        daily(rows: _*), "g", "day", "yc",
        season = 1, calibDays = 4, q = 0.5)
      .as[(String, Double, Long, Long, Double)].collect()(0)
    assert(got === (("a", 25.0, 4L, 3L, 0.75)))
  }

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

  test("mannKendall: even pair count averages BOTH middle slopes") {
    // 4 days -> m = 6 pairs. Metric values 0, 1, 4, 10 give sorted
    // slopes 1, 2, 3, 10/3, 4.5, 6 -> median = (3 + 10/3) / 2. The
    // pre-fix float-division rank match selected only the upper
    // middle (10/3), biasing sen_slope for every even m.
    val rows = Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 100L),
      ("a", "2024-01-03", 400L), ("a", "2024-01-04", 1000L))
    val r = TimeSeries.mannKendall(daily(rows: _*), "g", "day", "yc")
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("s") === 6L) // strictly increasing
    // no ties: Var(S) = 4*3*13/18
    assert(math.abs(r.getAs[Double]("var_s") - 156.0 / 18.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z")
      - 5.0 / math.sqrt(156.0 / 18.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("sen_slope")
      - (3.0 + 10.0 / 3.0) / 2.0) < 1e-12)
  }

  test("mannKendall: odd pair count picks the single middle slope") {
    // 3 days -> m = 3 pairs: slopes 1, 3, 2 -> sorted 1, 2, 3 ->
    // both middle ranks are row 2 -> median exactly 2.
    val rows = Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 100L),
      ("a", "2024-01-03", 400L))
    val r = TimeSeries.mannKendall(daily(rows: _*), "g", "day", "yc")
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("sen_slope") === 2.0)
  }
}
