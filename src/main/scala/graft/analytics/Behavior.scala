package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** User-behavior analytics over an event stream: gap-based
  * sessionization, ordered conversion funnels, and cohort retention.
  * The batch counterparts of `streaming/EventStreams.sessionize` —
  * the same semantics a warehouse user gets from the reference's SQL
  * layer, expressed as Spark plans that scale:
  *
  *   - sessionization is two per-user window functions (lag + running
  *     sum) over one hash partition by user — one shuffle, state never
  *     leaves the executor;
  *   - the funnel is a fold over each user's time-ordered event types
  *     (`aggregate` HOF) — one shuffle to group, no per-step re-join
  *     of the fact table (the naive conditional-agg cascade shuffles
  *     the events once per funnel step);
  *   - retention joins each event to its user's cohort week on the
  *     same user key and distinct-counts (cohort, offset, user).
  */
object Behavior {

  /** Gap-based sessionization: a new session starts when the gap to
    * the user's previous event exceeds `gapSec`. Adds `session_idx`
    * (0-based per user, time-ordered). Timestamp comparison is
    * integer microseconds, so session boundaries are deterministic.
    */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(unix_micros(col("ts")), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col("ts")) - prev > gapSec * 1000000L, 1L)
      .otherwise(0L)
    // a null event time carries no position on the session timeline —
    // drop it (like the other null-input operators) instead of
    // minting a phantom session per null row
    events.where(col("ts").isNotNull)
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** Kaplan–Meier survival over time-to-conversion with right
    * censoring: duration = days from a user's first event to their
    * first `targetType` event; users who never convert are censored
    * at their last observed day. At each distinct duration t,
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with nᵢ the at-risk count —
    * THE estimator for "how long until users convert" when many
    * never do (a plain median silently drops the censored mass).
    *
    * Determinism: each factor's ln((n−d)/n) is quantized to 1e-12
    * units and CUMULATIVELY SUMMED as exact integers over the
    * duration-domain window (|distinct durations| rows, never user
    * rows); the emitted statistic is ln S(t) = cumsum/1e12 — one
    * exact division, no libm exp on the output path. Rows after an
    * S = 0 step (d = n) report null.
    *
    * Output per distinct duration: (t_days, n_risk, n_events,
    * n_censored, ln_survival) ordered by t_days.
    */
  def kaplanMeier(events: DataFrame, targetType: String): DataFrame = {
    val perUser = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_day"),
        min(when(col("event_type") === targetType,
          to_date(col("ts")))).as("conv_day"),
        max(to_date(col("ts"))).as("last_day"))
      .select(col("user_id"),
        when(col("conv_day").isNotNull,
          datediff(col("conv_day"), col("first_day")))
          .otherwise(datediff(col("last_day"), col("first_day")))
          .cast("long").as("t_days"),
        col("conv_day").isNotNull.as("converted"))
    val perT = perUser.groupBy("t_days")
      .agg(sum(col("converted").cast("long")).as("d"),
        sum((!col("converted")).cast("long")).as("c"))
    // |buckets|-row window: single partition is the point
    val wAsc = Window.orderBy("t_days")
      .rowsBetween(Long.MinValue, -1)
    val wCum = Window.orderBy("t_days")
      .rowsBetween(Long.MinValue, 0)
    perT
      .withColumn("__gone",
        coalesce(sum(col("d") + col("c")).over(wAsc), lit(0L)))
      .crossJoin(broadcast(
        perUser.agg(count(lit(1)).as("__n_tot"))))
      .withColumn("n_risk", col("__n_tot") - col("__gone"))
      .withColumn("__lnf",
        when(col("d") > 0 && col("n_risk") > col("d"),
          round(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * 1e12).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("__dead",
        max((col("d") > 0 && col("n_risk") === col("d")).cast("int"))
          .over(wCum))
      .withColumn("__ls", sum(col("__lnf")).over(wCum))
      .select(col("t_days"), col("n_risk").cast("long"),
        col("d").cast("long").as("n_events"),
        col("c").cast("long").as("n_censored"),
        when(col("__dead") === 0,
          col("__ls").cast("double") / 1e12).as("ln_survival"))
      .orderBy("t_days")
  }

  /** Behavioral-LM anomaly scores: train a Laplace-smoothed bigram
    * model over the event-type TRANSITIONS of the train half (users
    * with even portable hash) and score every held-out user by mean
    * transition log-likelihood — users whose action sequences the
    * model finds improbable (lowest mean ln p) are the
    * scripted/anomalous candidates, the sequence-level complement
    * of [[interArrivalStats]]' timing signal.
    *
    * ln p((c+1)/(n+V)) is quantized to 1e-12 units per transition
    * (libm ln portability) and summed exactly; one division derives
    * the mean. Transition tables are |types|²-sized; the per-user
    * window is the [[sessionize]] shape. Unseen prefixes score
    * 1/V. Returns the `topK` most anomalous
    * (user_id, n_trans, avg_lnp), ascending avg_lnp.
    */
  def sequenceAnomaly(events: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, "topK >= 1")
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = events
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("user_id"), col("prev"),
        col("event_type").as("nxt"),
        (Dedup.h30(col("user_id").cast("string")) % 2 === 0)
          .as("is_train"))
    val train = tr.where(col("is_train"))
    val counts = train.groupBy("prev", "nxt")
      .agg(count(lit(1)).as("c"))
    val totals = train.groupBy("prev").agg(count(lit(1)).as("n"))
    val vocab = train.agg(countDistinct(col("nxt")).as("v"))
    tr.where(!col("is_train"))
      .join(counts, Seq("prev", "nxt"), "left")
      .join(totals, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lnp_fp",
        round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (coalesce(col("n"), lit(0L)) + col("v")).cast("double")) *
          1e12).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_trans"),
        sum(col("lnp_fp").cast(D38)).as("__s"))
      .select(col("user_id"), col("n_trans"),
        (col("__s").cast("double") / 1e12 /
          col("n_trans").cast("double")).as("avg_lnp"))
      .orderBy(asc("avg_lnp"), asc("user_id"))
      .limit(topK)
  }

  /** Default lateness classes for [[watermarkAudit]] (streaming
    * scale): 1 s / 1 min / 1 h boundaries in µs. */
  val StreamLatenessBounds: Seq[(Long, String)] = Seq(
    1000000L -> "late<=1s", 60000000L -> "late<=1min",
    3600000000L -> "late<=1h")

  /** Watermark-design audit: how late do events arrive relative to
    * the maximum event time already seen in ARRIVAL order (`idCol`)?
    * The lateness histogram (class `bounds` in µs, ascending) is
    * precisely the information needed to choose a Structured
    * Streaming watermark — the class that captures the tail you are
    * willing to drop IS the watermark.
    *
    * Scale shape: the global running max is computed in TWO PHASES
    * (the [[Sampling.tokenBudgetSelect]] trick) — a per-bucket
    * window (arrival-id div `bucketSize`) plus one bucket-domain
    * prefix-max window — so no corpus-wide sort ever happens; the
    * oracle computes the same running max with one naive global
    * window. Different algorithms, identical lateness per event.
    *
    * Output per lateness class: (class_id, label, n_events,
    * max_late_us) ordered — exact integer µs throughout.
    */
  def watermarkAudit(events: DataFrame, idCol: String,
      tsCol: String, bucketSize: Long = 8192L,
      bounds: Seq[(Long, String)] = StreamLatenessBounds,
      overflowLabel: String = "late>1h"): DataFrame = {
    require(bucketSize >= 2, "bucketSize must be >= 2")
    require(bounds.nonEmpty && bounds.map(_._1) == bounds.map(_._1).sorted,
      "bounds must be ascending and non-empty")
    val rows = events
      .where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("id"),
        unix_micros(col(tsCol)).as("t"))
      .withColumn("bucket", expr(s"id div ${bucketSize}L"))
    val wIn = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Long.MinValue, -1)
    val perBucket = rows.groupBy("bucket")
      .agg(max(col("t")).as("bmax"))
    // |buckets|-row window: single partition is the point
    val wB = Window.orderBy("bucket").rowsBetween(Long.MinValue, -1)
    val pref = perBucket.withColumn("pmax",
      max(col("bmax")).over(wB))
    val lateness = rows
      .withColumn("inmax", max(col("t")).over(wIn))
      .join(pref.select("bucket", "pmax"), Seq("bucket"))
      .withColumn("prev", greatest(
        coalesce(col("inmax"), lit(Long.MinValue)),
        coalesce(col("pmax"), lit(Long.MinValue))))
      .withColumn("late",
        when(col("prev") === Long.MinValue, lit(0L))
          .otherwise(greatest(col("prev") - col("t"), lit(0L))))
    val classId = bounds.zipWithIndex.foldLeft(
      when(col("late") === 0, 0)) { case (acc, ((b, _), i)) =>
      acc.when(col("late") <= b, i + 1)
    }.otherwise(bounds.size + 1)
    val label = bounds.zipWithIndex.foldLeft(
      when(col("class_id") === 0, "on_time")) {
      case (acc, ((_, l), i)) => acc.when(col("class_id") === i + 1, l)
    }.otherwise(overflowLabel)
    lateness
      .withColumn("class_id", classId)
      .groupBy("class_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        max(col("late")).cast("long").as("max_late_us"))
      .withColumn("label", label)
      .select(col("class_id").cast("int"), col("label"),
        col("n_events"), col("max_late_us"))
      .orderBy("class_id")
  }

  /** Coordinated-behavior rings: users whose event-type MIX is
    * identical after grid quantization — the bot-ring /
    * scripted-traffic signal (organic users spread over the profile
    * simplex; automation stamps out exact copies). Profile =
    * per-type share on an integer `scale`-cell grid (floor division
    * of exact counts — no float boundary), so membership is
    * deterministic on any engine; the default ventile grid trades
    * resolution for recall on short histories (a per-mille grid
    * needs hundreds of events per user before organic collisions
    * vanish and scripted ones remain).
    *
    * One user-keyed aggregation + one profile-keyed aggregation —
    * both map-side combined; never user×user. Returns rings with
    * ≥ `minUsers` members: (profile, n_users, min_user, max_user)
    * ordered by (n_users desc, profile).
    */
  def behaviorRings(events: DataFrame, types: Seq[String],
      minUsers: Int, scale: Int = 20): DataFrame = {
    require(types.nonEmpty && minUsers >= 2 && scale >= 2,
      "need types, minUsers >= 2, scale >= 2")
    val perUser = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        types.map(t => sum((col("event_type") === t).cast("long"))
          .as(s"c_$t")): _*)
    val profile = concat_ws("|", types.map(t =>
      expr(s"(c_$t * $scale) div n").cast("string")): _*)
    perUser
      .select(col("user_id"), profile.as("profile"))
      .groupBy("profile")
      .agg(count(lit(1)).cast("long").as("n_users"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"))
      .where(col("n_users") >= minUsers)
      .orderBy(col("n_users").desc, col("profile"))
  }

  /** Per-user inter-arrival statistics + Goh–Barabási burstiness
    * B = (σ−μ)/(σ+μ) over the gaps between consecutive events:
    * B → −1 is metronomic, ≈ 0 Poisson-random, → 1 bursty — the
    * bot-vs-human / scraper-detection signal a behavior pipeline
    * wants per user.
    *
    * Scale shape: one user-partitioned lag window (exact integer µs,
    * the [[sessionize]] contract) and one map-side-combined
    * aggregation; Σgap and Σgap² accumulate as DECIMAL(38,0) (gap²
    * overflows a long at month-scale gaps), with μ/σ/B derived in
    * doubles from the exact sums — the q48-moments recipe, replayed
    * identically by a HUGEINT oracle.
    *
    * Output: (user_id, n_events, n_gaps, mean_gap_us, burstiness)
    * for users with ≥ 2 gaps, ordered; B is null when σ+μ = 0
    * (all-zero gaps).
    */
  def interArrivalStats(events: DataFrame): DataFrame = {
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .where(col("gap").isNotNull)
    val agg = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(D38)).as("s"),
        sum(col("gap").cast(D38) * col("gap").cast(D38)).as("s2"))
      .where(col("n_gaps") >= 2)
    val mu = col("s").cast("double") / col("n_gaps").cast("double")
    val sigma = sqrt(col("s2").cast("double") /
      col("n_gaps").cast("double") - mu * mu)
    agg.select(col("user_id"),
        (col("n_gaps") + 1).cast("long").as("n_events"),
        col("n_gaps").cast("long").as("n_gaps"),
        mu.as("mean_gap_us"),
        when(sigma + mu > 0, (sigma - mu) / (sigma + mu))
          .as("burstiness"))
      .orderBy("user_id")
  }

  /** Per-session aggregates: bounds, duration (exact integer µs),
    * event count, exact-decimal value total, purchase count. */
  def sessionStats(events: DataFrame, gapSec: Long): DataFrame =
    sessionize(events, gapSec)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("total_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))

  /** Ordered-funnel stage per user: the highest stage `k` such that
    * the user's time-ordered events contain `steps(0) … steps(k-1)`
    * as a subsequence. One groupBy shuffle; the per-user scan is a
    * left fold over the sorted event types with a string stage
    * accumulator ("0", "1", …) — no per-step self-join of the fact.
    */
  def funnelStage(events: DataFrame, steps: Seq[String]): DataFrame = {
    val sorted = array_sort(collect_list(
      struct(col("ts"), col("event_id"), col("event_type"))))
    val fold = (acc: Column, x: Column) => {
      val et = x.getField("event_type")
      steps.zipWithIndex.foldLeft(acc) { case (els, (step, i)) =>
        when(acc === lit(i.toString) && et === step,
          lit((i + 1).toString)).otherwise(els)
      }
    }
    // non-step events cannot advance the fold, so they are dropped
    // BEFORE the group shuffle (at corpus scale the funnel types are
    // a sliver of the stream); users with no step events are stage 0
    // and simply absent from the result
    events.where(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(aggregate(sorted, lit("0"), fold).cast("int").as("stage"))
  }

  /** Funnel report: one row per step with the number of users whose
    * ordered events reached at least that step. `n_users` counts every
    * distinct user in the stream — including a null-user group, which
    * `countDistinct` would drop while the stage sums kept it — not
    * just users with funnel events; step counts are 0 (not null) when
    * no event matches any step. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    val users = events.select("user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    if (steps.isEmpty) return users
    val aggs = steps.zipWithIndex.map { case (step, i) =>
      coalesce(sum((col("stage") >= i + 1).cast("long")), lit(0L))
        .as(s"n_${step}")
    }
    val stepCounts = funnelStage(events, steps)
      .agg(aggs.head, aggs.tail: _*)
    users.crossJoin(stepCounts)
  }

  /** First-order Markov transition matrix over session-scoped event
    * sequences: P(next_type | prev_type), with the synthetic state
    * `_START` prepended to every session so session-opening events
    * are a proper row of the chain (the standard absorbing-start
    * construction; see e.g. the clickstream models surveyed in
    * Chierichetti et al., WWW'12).
    *
    * Scale shape: ONE hash shuffle by user (the sessionize window),
    * a per-row lag (no further shuffle — same window frame), then a
    * (prev,next)-keyed aggregation with map-side combine. The
    * per-prev totals come from a window over the AGGREGATED frame —
    * at most |types|² rows, so that second window is trivially small
    * no matter the corpus size. Probabilities are exact-long count
    * ratios divided once as doubles — deterministic under any
    * partitioning.
    */
  def markovTransitions(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts", "event_id")
    // null event types are dropped BEFORE the lag (matching SQL's
    // WHERE-before-window evaluation), so a null row never donates a
    // phantom `_START` to its successor
    val pairs = sessionize(events, gapSec)
      .where(col("event_type").isNotNull)
      .withColumn("prev_type",
        coalesce(lag(col("event_type"), 1).over(w), lit("_START")))
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy("prev_type")
    pairs
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(byPrev).cast("double"))
      .select("prev_type", "next_type", "n", "p")
  }

  /** Top-k frequent event paths: sliding `len`-grams of event types
    * within each session (no session boundary crossing), counted
    * corpus-wide. The sequence-mining primitive behind "what do
    * users actually do" dashboards — and, for a training-data
    * pipeline, behind behavioral-template dedup.
    *
    * Scale shape: the same single user-keyed shuffle as
    * [[sessionize]] (the lags reuse its window), then one path-keyed
    * count with map-side combine and a distributed TakeOrdered — no
    * global sort, nothing quadratic.
    */
  def topPaths(events: DataFrame, gapSec: Long, len: Int,
      topK: Int): DataFrame = {
    require(len >= 2, "path length must be >= 2")
    require(topK >= 1, "topK must be >= 1")
    val w = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts", "event_id")
    val steps = (len - 1 to 0 by -1)
      .map(i => lag(col("event_type"), i).over(w).as(s"e$i"))
    events
      .where(col("event_type").isNotNull)
      .transform(sessionize(_, gapSec))
      .select(steps: _*)
      // a full window means the deepest lag is non-null (event types
      // are non-null here, so a null lag ⇔ not enough predecessors)
      .where(col(s"e${len - 1}").isNotNull)
      .select(concat_ws(" > ",
        (len - 1 to 0 by -1).map(i => col(s"e$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(topK)
  }

  /** Cumulative cohort value ("LTV curve"): users bucketed by
    * first-event week; per (cohort_week, week_offset), the RUNNING
    * total of the cohort's event value and its per-user average —
    * the curve a growth team reads to compare cohort quality at
    * equal age.
    *
    * Exactness: weekly sums accumulate in integer cents, the running
    * total is a window sum over the (cohort, offset) aggregate frame
    * (≤ weeks² rows — tiny), and the two reported doubles are one
    * division each. Shuffles: the q66-style cohort join + one
    * aggregation; the cumsum never touches row-grain data. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val cohorts = events
      .where(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    val weekly = events
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("activity_week"),
        col("value"))
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("activity_week").cast("date"),
          col("cohort_week").cast("date")) / 7).cast("long")
          .as("week_offset"))
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast(DecimalType(38, 0)).as("__wc"))
    val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    weekly
      .withColumn("__cum", sum(col("__wc")).over(w))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd")
          .as("cohort_week"),
        col("week_offset"), col("n_users"),
        (col("__cum").cast("double") / lit(100.0)).as("cum_value"),
        (col("__cum").cast("double") /
          (lit(100.0) * col("n_users").cast("double")))
          .as("ltv_per_user"))
  }

  /** Weekly cohort retention: users bucketed by the week (Monday
    * start) of their first event; counts distinct active users per
    * (cohort_week, week_offset). */
  def weeklyRetention(events: DataFrame): DataFrame = {
    val cohorts = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    events.select(col("user_id"),
        date_trunc("week", col("ts")).as("activity_week"))
      .join(cohorts, Seq("user_id"))
      .groupBy(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        floor(datediff(col("activity_week").cast("date"),
          col("cohort_week").cast("date")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
