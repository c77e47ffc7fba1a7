package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.analytics.Agro

class AgroSpec extends SparkSpec {
  import spark.implicits._

  test("gdd: doubled-cents accumulation, frost and heat censuses") {
    // loc 1: (tmax, tmin) = (25.00, 5.00) → gdd 5.0; (12.00, −2.00) →
    // max(0, 12−2−20)=0, frost; (35.00, 20.00) → 17.5, heat
    val daily = Seq(
      (1L, 2500L, 500L), (1L, 1200L, -200L), (1L, 3500L, 2000L),
      (2L, 900L, 100L)) // below base → gdd 0
      .toDF("loc", "tmax_c", "tmin_c")
    val got = Agro.gdd(daily, "loc", "tmax_c", "tmin_c")
      .orderBy("loc")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 22.5, 1L, 1L),
      (2L, 1L, 0.0, 0L, 0L)))
  }

  test("gdd: exact-boundary day contributes zero, not negative") {
    // tmax+tmin = 2·base exactly → max(0, 0) = 0
    val daily = Seq((1L, 1500L, 500L)).toDF("loc", "tmax_c", "tmin_c")
    val got = Agro.gdd(daily, "loc", "tmax_c", "tmin_c")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 0.0, 0L, 0L)))
  }

  private def d(s: String) = Date.valueOf(s)

  test("drySpells: missing calendar day breaks a run") {
    // loc 1 dry: Jan 1,2,3 (run 3), Jan 5,6 (run 2 — Jan 4 observed
    // wet), Jan 9 (run 1 — Jan 7/8 unobserved)
    val daily = Seq(
      (1L, d("2024-01-01"), true), (1L, d("2024-01-02"), true),
      (1L, d("2024-01-03"), true), (1L, d("2024-01-04"), false),
      (1L, d("2024-01-05"), true), (1L, d("2024-01-06"), true),
      (1L, d("2024-01-09"), true),
      (2L, d("2024-01-01"), false)) // never dry
      .toDF("loc", "day", "is_dry")
    val got = Agro.drySpells(daily, "loc", "day", "is_dry",
      spellMinDays = 3).orderBy("loc")
      .as[(Long, Long, Long, Option[Long], Long)].collect().toSeq
    assert(got === Seq(
      (1L, 6L, 3L, Some(3L), 1L),
      (2L, 0L, 0L, None, 0L)))
  }

  test("waterBalance: window rewrite equals the sequential clamped fold") {
    // deterministic pseudo-random net series per loc; reference is the
    // literal recurrence D_t = max(0, D_{t-1} + net_t)
    val series = for (loc <- 1L to 3L; i <- 1 to 40) yield
      (loc, Date.valueOf(s"2024-01-01").toLocalDate.plusDays(i),
        ((loc * 7919 + i * 104729) % 1501) - 700L)
    val daily = series.map { case (l, d, n) =>
      (l, Date.valueOf(d), n) }.toDF("loc", "day", "net")
    val got = Agro.waterBalance(daily, "loc", "day", "net", 500L)
      .orderBy("loc")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exp = series.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (loc, rows) =>
        val deficits = rows.sortBy(_._2).map(_._3)
          .scanLeft(0L)((d, x) => math.max(0L, d + x)).tail
        (loc, rows.size.toLong, deficits.max, deficits.last,
          deficits.count(_ > 500L).toLong)
    }
    assert(got === exp)
  }

  test("waterBalance: all-negative net never goes below zero") {
    val daily = (1 to 5).map(i =>
      (1L, Date.valueOf(s"2024-01-0$i"), -10L)).toDF("loc", "day", "net")
    val got = Agro.waterBalance(daily, "loc", "day", "net", 0L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 0L, 0L, 0L)))
  }

  test("monthlyNormals: exact normals; strict > anomaly threshold") {
    // loc 1 month 1 across 3 years: 100.00, 200.00, 300.00 → normal
    // 200.00; |100·3−600|·100 = 30000 vs 50·600 = 30000 → NOT > (50%
    // exactly), so zero anomalies at the boundary
    val m1 = Seq(
      (1L, 1995L, 1L, 10000L), (1L, 1996L, 1L, 20000L),
      (1L, 1997L, 1L, 30000L)).toDF("loc", "y", "month", "v_c")
    val got1 = Agro.monthlyNormals(m1, "loc", "y", "month", "v_c", 50L)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got1 === Seq((1L, 1L, 3L, 200.0, 0L)))

    // push one year past the threshold: 90, 200, 310 → mean 200,
    // |90−200| = 110 > 100 → 2 anomalies (310 symmetric)
    val m2 = Seq(
      (1L, 1995L, 1L, 9000L), (1L, 1996L, 1L, 20000L),
      (1L, 1997L, 1L, 31000L)).toDF("loc", "y", "month", "v_c")
    val got2 = Agro.monthlyNormals(m2, "loc", "y", "month", "v_c", 50L)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got2 === Seq((1L, 1L, 3L, 200.0, 2L)))
  }

  test("seasonOnset: threshold day per year; unreached year is null") {
    // loc 1, 1995: daily contributions 6000, 0 (clamped), 6000 →
    // cum 6000/6000/12000 → onset on day 3; 1996: never reaches
    val d = Seq(
      (1L, "1995-03-01", 5000L, 3000L),  // +6000
      (1L, "1995-03-02", 900L, -1000L),  // clamped to 0
      (1L, "1995-03-03", 5000L, 3000L),  // +6000 → 12000 ≥ 10000
      (1L, "1996-03-01", 2000L, 1000L))  // +1000 only
      .toDF("loc", "day0", "tmax_c", "tmin_c")
      .withColumn("day", to_date(col("day0"))).drop("day0")
    val got = Agro.seasonOnset(d, "loc", "day", "tmax_c", "tmin_c",
      thresholdDoubledCents = 10000L)
      .orderBy("loc", "y")
      .as[(Long, Long, Option[String], Double, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1995L, Some("1995-03-03"), 60.0, 3L),
      (1L, 1996L, None, 5.0, 1L)))
  }

  test("frostFreeSeason: frost bracket; open window stays null") {
    val d = Seq(
      (1L, "1995-04-10", -100L), (1L, "1995-05-02", -50L), // spring
      (1L, "1995-05-03", 500L),
      (1L, "1995-10-01", -10L), (1L, "1995-11-01", -10L),  // autumn
      (2L, "1995-04-01", -100L))                           // no autumn
      .toDF("loc", "day0", "tmin_c")
      .withColumn("day", to_date(col("day0"))).drop("day0")
    val got = Agro.frostFreeSeason(d, "loc", "day", "tmin_c")
      .orderBy("loc", "y")
      .as[(Long, Long, Option[String], Option[String], Option[Long])]
      .collect().toSeq
    // loc 1: last spring 05-02, first autumn 10-01, 151 days strictly
    // between; loc 2: no autumn frost → open (null) window
    assert(got === Seq(
      (1L, 1995L, Some("1995-05-02"), Some("1995-10-01"), Some(151L)),
      (2L, 1995L, Some("1995-04-01"), None, None)))
  }

  test("monthlyZScores: exact integer z; zero variance yields null") {
    // month 1: values 100/200/300 → mean 200, population sd =
    // sqrt(2/3)·100 → z = ±sqrt(3/2), 0 exactly; month 2: constant →
    // null z
    val m = Seq(
      (1L, 1995L, 1L, 100L), (1L, 1996L, 1L, 200L),
      (1L, 1997L, 1L, 300L),
      (1L, 1995L, 2L, 77L), (1L, 1996L, 2L, 77L))
      .toDF("loc", "y", "month", "v_c")
    val got = Agro.monthlyZScores(m, "loc", "y", "month", "v_c")
      .orderBy("loc", "y", "month")
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    // z = (n·v − S)/sqrt(n·Q − S²): n=3, S=600, Q=140000 →
    // radicand 60000, numerators ∓300/0/+300
    val z = 300.0 / math.sqrt(60000.0)
    assert(got === Seq(
      (1L, 1995L, 1L, 100L, 3L, Some(-z)),
      (1L, 1995L, 2L, 77L, 2L, None),
      (1L, 1996L, 1L, 200L, 3L, Some(0.0)),
      (1L, 1996L, 2L, 77L, 2L, None),
      (1L, 1997L, 1L, 300L, 3L, Some(z))))
  }
}
