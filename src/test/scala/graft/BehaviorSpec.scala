package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analytics.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("behaviorRings: identical mixes group, different mixes and " +
      "sub-threshold rings drop") {
    val e = events(
      // users 1,2: same 2-view 1-click mix; user 3: inverted;
      // user 4: unique mix (ring of one, dropped at minUsers=2)
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:01:00", 1L, "view", 1.0),
      (3L, "2024-01-01 10:02:00", 1L, "click", 1.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 1.0),
      (5L, "2024-01-01 10:01:00", 2L, "view", 1.0),
      (6L, "2024-01-01 10:02:00", 2L, "click", 1.0),
      (7L, "2024-01-01 10:00:00", 3L, "click", 1.0),
      (8L, "2024-01-01 10:01:00", 3L, "click", 1.0),
      (9L, "2024-01-01 10:02:00", 3L, "view", 1.0),
      (10L, "2024-01-01 10:00:00", 4L, "purchase", 1.0))
    val got = Behavior.behaviorRings(e,
        Seq("view", "click", "purchase"), minUsers = 2)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === 1)
    assert(got(0) === (("13|6|0", 2L, 1L, 2L)))
  }

  test("sequenceAnomaly: hand-computed Laplace bigram scores on a " +
      "fixed train/test split") {
    import graft.analytics.Dedup
    // find one even-hash (train) and one odd-hash (test) user id
    def trainUser(id: Long): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(8), 16) % Dedup.P % 2 == 0
    }
    val tr = (1L to 50L).find(trainUser).get
    val te = (1L to 50L).find(!trainUser(_)).get
    // train transitions: a->b, b->a, a->b  (counts: a->b 2, b->a 1;
    // totals: a 2, b 1; V = 2)
    val e = events(
      (1L, "2024-01-01 10:00:00", tr, "a", 1.0),
      (2L, "2024-01-01 10:01:00", tr, "b", 1.0),
      (3L, "2024-01-01 10:02:00", tr, "a", 1.0),
      (4L, "2024-01-01 10:03:00", tr, "b", 1.0),
      // test user: a->b (seen, p=(2+1)/(2+2)) then b->b (unseen,
      // p=(0+1)/(1+2))
      (5L, "2024-01-01 10:00:00", te, "a", 1.0),
      (6L, "2024-01-01 10:01:00", te, "b", 1.0),
      (7L, "2024-01-01 10:02:00", te, "b", 1.0))
    val got = graft.analytics.Behavior.sequenceAnomaly(e, topK = 5)
      .as[(Long, Long, Double)].collect()
    assert(got.length === 1 && got(0)._1 === te && got(0)._2 === 2L)
    val want = (math.log(3.0 / 4) + math.log(1.0 / 3)) / 2
    assert(math.abs(got(0)._3 - want) < 1e-9)
  }

  test("watermarkAudit: two-phase running max equals naive lateness " +
      "across bucket boundaries") {
    // arrival order 1..6 with event times (minutes):
    //   10, 50, 20, 49, 120, 119  ->  lateness: 0, 0, 30m, 1m, 0, 1m
    val e = events(
      (1L, "2024-01-01 00:10:00", 1L, "view", 1.0),
      (2L, "2024-01-01 00:50:00", 1L, "view", 1.0),
      (3L, "2024-01-01 00:20:00", 1L, "view", 1.0),
      (4L, "2024-01-01 00:49:00", 1L, "view", 1.0),
      (5L, "2024-01-01 02:00:00", 1L, "view", 1.0),
      (6L, "2024-01-01 01:59:00", 1L, "view", 1.0))
    // bucketSize 2 puts boundaries between arrivals, exercising the
    // cross-bucket prefix-max path. Expected lateness per arrival:
    // ids 1,2,5 on time; id 4 and id 6 late 1 min; id 3 late 30 min
    val got = graft.analytics.Behavior.watermarkAudit(e,
        "event_id", "ts", bucketSize = 2L)
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0) === (("on_time", 3L, 0L)))
    assert(got(2) === (("late<=1min", 2L, 60000000L)))
    assert(got(3) === (("late<=1h", 1L, 1800000000L)))
    assert(got.size === 3)
  }

  test("kaplanMeier: hand-computed survival steps with censoring") {
    // 4 users: convert at day 1 (u1), day 2 (u2); censored at day 1
    // (u3) and day 3 (u4)
    val e = events(
      (1L, "2024-01-01 09:00:00", 1L, "view", 1.0),
      (2L, "2024-01-02 09:00:00", 1L, "purchase", 1.0),
      (3L, "2024-01-01 09:00:00", 2L, "view", 1.0),
      (4L, "2024-01-03 09:00:00", 2L, "purchase", 1.0),
      (5L, "2024-01-01 09:00:00", 3L, "view", 1.0),
      (6L, "2024-01-02 09:00:00", 3L, "view", 1.0),
      (7L, "2024-01-01 09:00:00", 4L, "view", 1.0),
      (8L, "2024-01-04 09:00:00", 4L, "view", 1.0))
    val got = Behavior.kaplanMeier(e, "purchase")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // t=1: risk 4, 1 event (u1), 1 censored (u3) -> S = 3/4
    assert((got(1L)._2, got(1L)._3, got(1L)._4) === ((4L, 1L, 1L)))
    assert(math.abs(got(1L)._5.get - math.log(0.75)) < 1e-9)
    // t=2: risk 2, 1 event (u2) -> S = 3/4 * 1/2
    assert((got(2L)._2, got(2L)._3) === ((2L, 1L)))
    assert(math.abs(got(2L)._5.get - math.log(0.375)) < 1e-9)
    // t=3: risk 1, censored only -> survival unchanged
    assert((got(3L)._2, got(3L)._4) === ((1L, 1L)))
    assert(math.abs(got(3L)._5.get - math.log(0.375)) < 1e-9)
  }

  test("interArrivalStats: closed forms for metronomic and known " +
      "two-gap users; singles dropped") {
    val e = events(
      // user 1: gaps 60s, 60s, 60s -> sigma 0, B = -1
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:01:00", 1L, "view", 1.0),
      (3L, "2024-01-01 10:02:00", 1L, "view", 1.0),
      (4L, "2024-01-01 10:03:00", 1L, "view", 1.0),
      // user 2: gaps 10s and 30s -> mu 20e6, sigma 10e6, B = -1/3
      (5L, "2024-01-01 10:00:00", 2L, "view", 1.0),
      (6L, "2024-01-01 10:00:10", 2L, "view", 1.0),
      (7L, "2024-01-01 10:00:40", 2L, "view", 1.0),
      // user 3: only one gap -> dropped
      (8L, "2024-01-01 10:00:00", 3L, "view", 1.0),
      (9L, "2024-01-01 10:00:05", 3L, "view", 1.0))
    val got = Behavior.interArrivalStats(e)
      .as[(Long, Long, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 3L, 6.0e7, Some(-1.0))))
    val (_, n2, g2, mu2, b2) = got(2L)
    assert((n2, g2, mu2) === ((3L, 2L, 2.0e7)))
    assert(math.abs(b2.get - (-1.0 / 3)) < 1e-12)
    assert(!got.contains(3L))
  }

  test("sessionize: gap strictly over threshold starts a new session") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      // exactly 1800 s later — same session (strict > comparison)
      (2L, "2024-01-01 10:30:00", 7L, "click", 1.0),
      // 1801 s later — new session
      (3L, "2024-01-01 11:00:01", 7L, "view", 1.0))
    val got = Behavior.sessionize(e, 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("sessionize: null event times are dropped, not phantom sessions") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 7L, "view", 1.0),
      (2L, "2024-01-01 10:10:00", 7L, "click", 1.0))
      .unionByName(Seq((3L, 7L, "view", 1.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .withColumn("ts", lit(null).cast("timestamp")))
    val got = Behavior.sessionize(e, 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("sessionize: sessions are per-user; stats aggregate correctly") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 2.0),
      (2L, "2024-01-01 10:10:00", 1L, "purchase", 3.5),
      (3L, "2024-01-01 10:05:00", 2L, "view", 1.0))
    val got = Behavior.sessionStats(e, 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(got.length === 2)
    val s1 = got(0)
    assert(s1.getAs[Long]("n_events") === 2L)
    assert(s1.getAs[Long]("duration_us") === 600000000L)
    assert(s1.getAs[Double]("total_value") === 5.5)
    assert(s1.getAs[Long]("n_purchases") === 1L)
    assert(got(1).getAs[Long]("n_events") === 1L)
  }

  test("funnel: steps must appear in order") {
    val e = events(
      // user 1: click before view, then view — only stage 1
      (1L, "2024-01-01 09:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 09:01:00", 1L, "view", 0.0),
      // user 2: full ordered funnel
      (3L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (4L, "2024-01-01 09:01:00", 2L, "click", 0.0),
      (5L, "2024-01-01 09:02:00", 2L, "purchase", 0.0),
      // user 3: purchase without prior click — stage 1 only
      (6L, "2024-01-01 09:00:00", 3L, "view", 0.0),
      (7L, "2024-01-01 09:01:00", 3L, "purchase", 0.0))
    val stages = Behavior.funnelStage(e, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(stages === Map(1L -> 1, 2L -> 3, 3L -> 1))
    val f = Behavior.funnel(e, Seq("view", "click", "purchase")).collect()(0)
    assert(f.getAs[Long]("n_users") === 3L)
    assert(f.getAs[Long]("n_view") === 3L)
    assert(f.getAs[Long]("n_click") === 1L)
    assert(f.getAs[Long]("n_purchase") === 1L)
  }

  test("funnel: users with only non-step events count in n_users only") {
    val e = events(
      (1L, "2024-01-01 09:00:00", 1L, "error", 0.0),
      (2L, "2024-01-01 09:01:00", 2L, "view", 0.0))
    val f = Behavior.funnel(e, Seq("view", "click", "purchase")).collect()(0)
    assert(f.getAs[Long]("n_users") === 2L)
    assert(f.getAs[Long]("n_view") === 1L)
    // and funnelStage omits the step-less user entirely
    val stages = Behavior.funnelStage(e, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(stages === Map(2L -> 1))
  }

  test("funnel: zero step counts (not null) when no step events exist") {
    val e = events((1L, "2024-01-01 09:00:00", 1L, "error", 0.0))
    val f = Behavior.funnel(e, Seq("view", "click", "purchase")).collect()(0)
    assert(f.getAs[Long]("n_users") === 1L)
    assert(f.getAs[Long]("n_view") === 0L)
    assert(f.getAs[Long]("n_purchase") === 0L)
  }

  test("funnel: a null-user group counts as one user") {
    val e = events((1L, "2024-01-01 09:00:00", 1L, "view", 0.0))
      .unionByName(Seq(("2024-01-01 09:01:00", "view"))
        .toDF("tss", "event_type")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
        .withColumn("event_id", lit(2L))
        .withColumn("user_id", lit(null).cast("long"))
        .withColumn("value", lit(0.0))
        .select("event_id", "user_id", "event_type", "value", "ts"))
    val f = Behavior.funnel(e, Seq("view", "click", "purchase")).collect()(0)
    assert(f.getAs[Long]("n_users") === 2L)
    assert(f.getAs[Long]("n_view") === 2L)
  }

  test("funnel: empty step list degenerates to the user count") {
    val e = events((1L, "2024-01-01 09:00:00", 1L, "view", 0.0))
    val f = Behavior.funnel(e, Seq.empty).collect()(0)
    assert(f.getAs[Long]("n_users") === 1L)
  }

  test("funnel: a user whose first matching step is later still counts") {
    val e = events(
      (1L, "2024-01-01 09:00:00", 1L, "error", 0.0),
      (2L, "2024-01-01 09:01:00", 1L, "view", 0.0),
      (3L, "2024-01-01 09:02:00", 1L, "click", 0.0))
    val stages = Behavior.funnelStage(e, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(stages === Map(1L -> 2))
  }

  test("markovTransitions: _START per session, probabilities row-normalized") {
    val e = events(
      // user 1, session 0: view -> click -> view
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      // user 1, session 1 (gap > 30 min): view — fresh _START
      (4L, "2024-01-01 12:00:00", 1L, "view", 0.0),
      // user 2, one session: click
      (5L, "2024-01-01 10:00:00", 2L, "click", 0.0))
    val got = Behavior.markovTransitions(e, 1800)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === Map(
      ("_START", "view") -> (2L, 2.0 / 3.0),
      ("_START", "click") -> (1L, 1.0 / 3.0),
      ("view", "click") -> (1L, 1.0),
      ("click", "view") -> (1L, 1.0)))
  }

  test("markovTransitions: null event types neither emit nor break the chain") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "click", 0.0))
      .unionByName(Seq((2L, "2024-01-01 10:01:00", 1L, 0.0))
        .toDF("event_id", "tss", "user_id", "value")
        .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
        .withColumn("event_type", lit(null).cast("string"))
        .select("event_id", "user_id", "event_type", "value", "ts"))
    val got = Behavior.markovTransitions(e, 1800)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the null row between view and click is skipped entirely:
    // view -> click is still one observed transition
    assert(got === Map(
      ("_START", "view") -> 1L, ("view", "click") -> 1L))
  }

  test("topPaths: 3-grams never cross a session boundary") {
    val e = events(
      // session 0: view click purchase -> one 3-gram
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      // > 30 min gap: new session; its events join no cross-gap gram
      (4L, "2024-01-01 12:00:00", 1L, "view", 0.0),
      (5L, "2024-01-01 12:01:00", 1L, "view", 0.0))
    val got = Behavior.topPaths(e, 1800, len = 3, topK = 10)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("view > click > purchase", 1L)))
  }

  test("topPaths: counts aggregate across users, ties break by path") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:00:00", 2L, "a", 0.0),
      (4L, "2024-01-01 10:01:00", 2L, "b", 0.0),
      (5L, "2024-01-01 10:00:00", 3L, "a", 0.0),
      (6L, "2024-01-01 10:01:00", 3L, "c", 0.0))
    val got = Behavior.topPaths(e, 1800, len = 2, topK = 2)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a > b", 2L), ("a > c", 1L)))
  }

  test("cohortLtv: running totals per cohort, per-user average") {
    val e = events(
      // user 1 cohort week of Jan 1 (Mon): 2.00 week0, 3.00 week2
      (1L, "2024-01-02 10:00:00", 1L, "view", 2.0),
      (2L, "2024-01-16 10:00:00", 1L, "view", 3.0),
      // user 2 same cohort: 4.00 week0
      (3L, "2024-01-03 10:00:00", 2L, "view", 4.0))
    val got = Behavior.cohortLtv(e)
      .orderBy("cohort_week", "week_offset")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L, 6.0, 3.0),
      ("2024-01-01", 2L, 2L, 9.0, 4.5)))
  }

  test("weeklyRetention: offsets measured from first-event week") {
    val e = events(
      // user 1: first event Tue week0, active again week2
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-16 10:00:00", 1L, "view", 0.0),
      // user 2: single event in week1
      (3L, "2024-01-10 10:00:00", 2L, "view", 0.0))
    val got = Behavior.weeklyRetention(e)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }
}
