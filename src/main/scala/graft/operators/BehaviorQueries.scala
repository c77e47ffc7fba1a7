package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Behavior

/** Behavioral analytics over `events`: gap sessionization, ordered
  * conversion funnel, weekly cohort retention. These are the standard
  * event-warehouse queries a user of the reference's SQL layer writes
  * by hand; here they are library operators with scale-safe plans
  * (see [[graft.analytics.Behavior]] for the shuffle accounting).
  */
object BehaviorQueries {

  val all: Seq[Q] = Seq(

    // Per-user inter-arrival burstiness (Goh–Barabási B = (σ−μ)/(σ+μ)
    // over event gaps): metronomic → −1, Poisson ≈ 0, bursty → 1 —
    // the bot/scraper detection signal. Gaps are exact integer µs;
    // Σgap and Σgap² accumulate as HUGEINT/DECIMAL(38,0), with μ/σ/B
    // derived in doubles from the same exact sums in both engines.
    Q("q193_burstiness", Some("""
      WITH g AS (
        SELECT user_id,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
          SUM(CAST(gap AS HUGEINT)) AS s,
          SUM(CAST(gap AS HUGEINT) * gap) AS s2
        FROM g WHERE gap IS NOT NULL
        GROUP BY 1 HAVING count(*) >= 2)
      SELECT user_id, n_gaps + 1 AS n_events, n_gaps,
        CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
        CASE WHEN sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) -
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) *
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))) +
            CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) > 0
        THEN (sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) -
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) *
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))) -
              CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) /
             (sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) -
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) *
              (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))) +
              CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        END AS burstiness
      FROM a ORDER BY user_id""")) { (s, dir) =>
      Behavior.interArrivalStats(Tables.load(s, dir, "events"))
    },

    // Behavioral-LM anomaly: Laplace-smoothed bigram transition
    // model trained on even-hash users, held-out users scored by
    // mean transition ln-likelihood (1e-12-quantized, summed exact)
    // — lowest scores are the scripted/anomalous candidates. Top 20.
    Q("q225_behavior_lm", Some(s"""
      WITH tr AS (
        SELECT user_id, prev, event_type AS nxt,
          (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${graft.analytics.Dedup.P}) % 2 = 0
            AS is_train
        FROM (
          SELECT user_id, ts, event_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND event_type IS NOT NULL)
        WHERE prev IS NOT NULL),
      c AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
            FROM tr WHERE is_train GROUP BY 1, 2),
      t AS (SELECT prev, CAST(count(*) AS BIGINT) AS n
            FROM tr WHERE is_train GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT nxt) AS BIGINT) AS v
            FROM tr WHERE is_train),
      sc AS (
        SELECT tr.user_id,
          CAST(round(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
            CAST(COALESCE(t.n, 0) + v.v AS DOUBLE))
            * 1000000000000.0) AS BIGINT) AS fp
        FROM tr
        LEFT JOIN c ON tr.prev = c.prev AND tr.nxt = c.nxt
        LEFT JOIN t ON tr.prev = t.prev
        CROSS JOIN v
        WHERE NOT tr.is_train)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_trans,
        CAST(SUM(CAST(fp AS HUGEINT)) AS DOUBLE) / 1000000000000.0
          / CAST(count(*) AS DOUBLE) AS avg_lnp
      FROM sc GROUP BY 1
      ORDER BY avg_lnp, user_id LIMIT 20""")) { (s, dir) =>
      graft.analytics.Behavior.sequenceAnomaly(
        Tables.load(s, dir, "events"), topK = 20)
    },

    // Last-touch purchase attribution: every purchase credits the
    // user's most recent non-purchase event (same-instant channel
    // counts — the as-of union puts the right side first at equal
    // timestamps). Channels are deduplicated to one per (user, ts)
    // by max event_id so the as-of pick is deterministic; purchases
    // with no prior touch report 'none'. One union + per-user
    // window — the merge-join as-of shape, never per-purchase scans.
    Q("q219_attribution", Some("""
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      ch AS (
        SELECT user_id, ts, arg_max(event_type, event_id)
          AS event_type
        FROM ev WHERE event_type <> 'purchase' GROUP BY 1, 2),
      pur AS (
        SELECT user_id, ts, event_id FROM ev
        WHERE event_type = 'purchase'),
      att AS (
        SELECT p.event_id,
          (SELECT c.event_type FROM ch c
           WHERE c.user_id = p.user_id AND c.ts <= p.ts
           ORDER BY c.ts DESC LIMIT 1) AS channel
        FROM pur p)
      SELECT COALESCE(channel, 'none') AS channel,
        CAST(count(*) AS BIGINT) AS n_purchases
      FROM att GROUP BY 1 ORDER BY channel""")) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .where(col("user_id").isNotNull && col("ts").isNotNull)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val channels = ev.where(col("event_type") =!= "purchase")
        .groupBy("user_id", "ts")
        .agg(expr("max_by(event_type, event_id)").as("event_type"))
      graft.analytics.AsOfJoin.lastPrior(purchases, channels,
          Seq("user_id"), "ts", Seq("event_type"))
        .groupBy(coalesce(col("asof_event_type"), lit("none"))
          .as("channel"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy("channel")
    },

    // Watermark-design audit on a GENUINELY disordered stream:
    // orders arrive in o_orderkey sequence but carry o_orderdate
    // event times (99.9% of rows are behind the running max, up to
    // years — the `events` stream is generator-ordered and would
    // audit as all-on-time). Spark runs the two-phase bucketed
    // running max (no global sort); the oracle runs the naive
    // single-window form — different algorithms, identical
    // per-row lateness. Day-scale class ladder.
    Q("q215_watermark_audit", Some("""
      WITH r AS (
        SELECT o_orderkey AS id, epoch_us(o_orderdate) AS t
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL),
      rm AS (
        SELECT id, t, MAX(t) OVER (ORDER BY id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        FROM r),
      lt AS (
        SELECT CASE WHEN prev IS NULL THEN 0
          ELSE greatest(prev - t, 0) END AS late
        FROM rm),
      cl AS (
        SELECT CASE WHEN late = 0 THEN 0
          WHEN late <= 86400000000 THEN 1
          WHEN late <= 604800000000 THEN 2
          WHEN late <= 2592000000000 THEN 3
          WHEN late <= 31536000000000 THEN 4
          ELSE 5 END AS class_id, late
        FROM lt)
      SELECT CAST(class_id AS INT) AS class_id,
        CASE class_id WHEN 0 THEN 'on_time' WHEN 1 THEN 'late<=1d'
          WHEN 2 THEN 'late<=7d' WHEN 3 THEN 'late<=30d'
          WHEN 4 THEN 'late<=365d' ELSE 'late>365d' END AS label,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(MAX(late) AS BIGINT) AS max_late_us
      FROM cl GROUP BY class_id ORDER BY class_id""")) { (s, dir) =>
      val day = 86400000000L
      graft.analytics.Behavior.watermarkAudit(
        Tables.load(s, dir, "orders")
          // parquet NTZ → session-UTC timestamp (the UTC session makes
          // the wall time the instant, matching the oracle's epoch_us)
          .withColumn("o_orderdate",
            col("o_orderdate").cast("timestamp")),
        "o_orderkey", "o_orderdate",
        bounds = Seq(day -> "late<=1d", 7 * day -> "late<=7d",
          30 * day -> "late<=30d", 365 * day -> "late<=365d"),
        overflowLabel = "late>365d")
    },

    // Coordinated-behavior rings: users with an IDENTICAL ventile
    // event-type mix (exact floor division — no float boundary).
    // Organic users spread over the profile simplex; scripted
    // traffic stamps out copies.
    Q("q211_behavior_rings", Some("""
      WITH u AS (
        SELECT user_id, count(*) AS n,
          SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS c_view,
          SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS c_click,
          SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS c_purchase,
          SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS c_signup,
          SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS c_error
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1),
      p AS (
        SELECT user_id, concat_ws('|',
          CAST(c_view * 20 // n AS VARCHAR),
          CAST(c_click * 20 // n AS VARCHAR),
          CAST(c_purchase * 20 // n AS VARCHAR),
          CAST(c_signup * 20 // n AS VARCHAR),
          CAST(c_error * 20 // n AS VARCHAR)) AS profile
        FROM u)
      SELECT profile, CAST(count(*) AS BIGINT) AS n_users,
        CAST(MIN(user_id) AS BIGINT) AS min_user,
        CAST(MAX(user_id) AS BIGINT) AS max_user
      FROM p GROUP BY 1 HAVING count(*) >= 2
      ORDER BY n_users DESC, profile""")) { (s, dir) =>
      graft.analytics.Behavior.behaviorRings(
        Tables.load(s, dir, "events"),
        Seq("view", "click", "purchase", "signup", "error"),
        minUsers = 2)
    },

    // Kaplan–Meier time-to-first-purchase with right censoring:
    // never-converting users are censored at their last observed
    // day instead of dropped. Each KM factor's ln((n−d)/n) is
    // quantized to 1e-12 units and cumulatively summed exactly over
    // the duration domain; the emitted statistic is ln S(t) — one
    // exact division, no libm exp on the output path.
    Q("q212_kaplan_meier", Some("""
      WITH pu AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
          MIN(CASE WHEN event_type = 'purchase'
            THEN CAST(ts AS DATE) END) AS cd,
          MAX(CAST(ts AS DATE)) AS ld
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1),
      du AS (
        SELECT user_id,
          CAST(CASE WHEN cd IS NOT NULL THEN date_diff('day', fd, cd)
               ELSE date_diff('day', fd, ld) END AS BIGINT) AS t_days,
          cd IS NOT NULL AS conv
        FROM pu),
      pt AS (
        SELECT t_days,
          CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS d,
          CAST(SUM(CASE WHEN conv THEN 0 ELSE 1 END) AS BIGINT) AS c
        FROM du GROUP BY 1),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM du),
      r AS (
        SELECT t_days, d, c,
          COALESCE(SUM(d + c) OVER (ORDER BY t_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS gone
        FROM pt),
      r2 AS (
        SELECT t_days, d, c, CAST(n_tot - gone AS BIGINT) AS n_risk,
          CASE WHEN d > 0 AND n_tot - gone > d THEN
            CAST(round(ln(CAST(n_tot - gone - d AS DOUBLE)
              / CAST(n_tot - gone AS DOUBLE)) * 1000000000000.0)
              AS BIGINT)
          ELSE 0 END AS lnf,
          CASE WHEN d > 0 AND n_tot - gone = d THEN 1 ELSE 0 END
            AS dead
        FROM r CROSS JOIN nt),
      r3 AS (
        SELECT t_days, n_risk, d, c,
          SUM(lnf) OVER wc AS ls, MAX(dead) OVER wc AS dd
        FROM r2 WINDOW wc AS (ORDER BY t_days
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT t_days, n_risk, d AS n_events, c AS n_censored,
        CASE WHEN dd = 0 THEN
          CAST(ls AS DOUBLE) / 1000000000000.0 END AS ln_survival
      FROM r3 ORDER BY t_days""")) { (s, dir) =>
      graft.analytics.Behavior.kaplanMeier(
        Tables.load(s, dir, "events"), "purchase")
    },

    // Gap-based sessionization (30-minute inactivity gap) with
    // per-session aggregates. Boundaries compare integer microseconds.
    Q("q64_sessionize", Some("""
      WITH s AS (
        SELECT user_id, event_id, ts, value, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), t AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
          AS session_idx
        FROM s
      )
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
               AS duration_us,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS n_purchases
      FROM t GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      Behavior.sessionStats(Tables.load(s, dir, "events"), gapSec = 1800)
        .orderBy("user_id", "session_idx")
    },

    // Ordered view→click→purchase funnel: per-user subsequence fold
    // over time-ordered event types, then stage-reached counts.
    Q("q65_funnel", Some("""
      WITH per AS (
        SELECT user_id,
          CAST(list_reduce(
            list_prepend('0', list(event_type ORDER BY ts, event_id)),
            (a, x) -> CASE WHEN a = '0' AND x = 'view' THEN '1'
                           WHEN a = '1' AND x = 'click' THEN '2'
                           WHEN a = '2' AND x = 'purchase' THEN '3'
                           ELSE a END) AS INT) AS stage
        FROM events GROUP BY user_id
      )
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN stage >= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_view,
             CAST(sum(CASE WHEN stage >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click,
             CAST(sum(CASE WHEN stage >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchase
      FROM per""")) { (s, dir) =>
      Behavior.funnel(Tables.load(s, dir, "events"),
        Seq("view", "click", "purchase"))
    },

    // First-order Markov transition matrix over session-scoped event
    // sequences (30-min gap sessions, `_START` prepended per session).
    // Counts are exact longs; each probability is one double division
    // of exact longs, so the hash matches under any partitioning.
    Q("q133_markov_transitions", Some("""
      WITH s AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), t AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
          AS session_idx
        FROM s
      ), pairs AS (
        SELECT coalesce(lag(event_type) OVER (
                 PARTITION BY user_id, session_idx
                 ORDER BY ts, event_id), '_START') AS prev_type,
               event_type AS next_type
        FROM t WHERE event_type IS NOT NULL
      ), agg AS (
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY 1, 2
      )
      SELECT prev_type, next_type, n,
             CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      FROM agg ORDER BY prev_type, next_type""")) { (s, dir) =>
      Behavior.markovTransitions(Tables.load(s, dir, "events"),
        gapSec = 1800)
        .orderBy("prev_type", "next_type")
    },

    // Top-20 frequent session paths (sliding event-type 3-grams that
    // never cross a session boundary) — the sequence-mining
    // primitive behind behavioral dashboards.
    Q("q138_event_paths", Some("""
      WITH s AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), t AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
          AS session_idx
        FROM s
      ), g AS (
        SELECT lag(event_type, 2) OVER w2 AS e2,
               lag(event_type, 1) OVER w2 AS e1,
               event_type AS e0
        FROM t
        WINDOW w2 AS (PARTITION BY user_id, session_idx
                      ORDER BY ts, event_id)
      )
      SELECT e2 || ' > ' || e1 || ' > ' || e0 AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM g WHERE e2 IS NOT NULL
      GROUP BY 1 ORDER BY n DESC, path LIMIT 20""")) { (s, dir) =>
      Behavior.topPaths(Tables.load(s, dir, "events"),
        gapSec = 1800, len = 3, topK = 20)
    },

    // Conversion-lag distribution: per user, first 'view' → first
    // subsequent 'purchase' in integer microseconds; exact
    // interpolated quantiles of the lag plus the conversion rate.
    Q("q153_conversion_lag", Some("""
      WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
          AND user_id IS NOT NULL
        GROUP BY 1
      ), p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
          AND epoch_us(e.ts) >= v.t0
        GROUP BY 1
      ), lags AS (
        SELECT v.user_id, p.t1 - v.t0 AS lag_us
        FROM v JOIN p ON v.user_id = p.user_id
      )
      SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewers,
        CAST(count(*) AS BIGINT) AS n_converted,
        CAST(count(*) AS DOUBLE)
          / CAST((SELECT count(*) FROM v) AS DOUBLE) AS conv_rate,
        quantile_cont(lag_us, 0.5) AS p50_lag_us,
        quantile_cont(lag_us, 0.9) AS p90_lag_us
      FROM lags""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .where(col("ts").isNotNull && col("user_id").isNotNull)
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t0"))
      val p = e.where(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .where(unix_micros(col("ts")) >= col("t0"))
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
      val lags = v.join(p, Seq("user_id"))
        .select((col("t1") - col("t0")).as("lag_us"))
      val nViewers = v.agg(count(lit(1)).as("n_viewers"))
      lags.agg(count(lit(1)).as("n_converted"),
          percentile(col("lag_us"), lit(0.5)).as("p50_lag_us"),
          percentile(col("lag_us"), lit(0.9)).as("p90_lag_us"))
        .crossJoin(broadcast(nViewers))
        .select(col("n_viewers"), col("n_converted"),
          (col("n_converted").cast("double") /
            col("n_viewers").cast("double")).as("conv_rate"),
          col("p50_lag_us"), col("p90_lag_us"))
    },

    // Cumulative cohort value (LTV curves): running per-cohort value
    // totals and per-user averages by week offset — integer-cents
    // running sums over the tiny cohort×offset frame.
    Q("q152_cohort_ltv", Some("""
      WITH c AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
      ), sz AS (
        SELECT cw, CAST(count(*) AS BIGINT) AS n_users
        FROM c GROUP BY 1
      ), wk AS (
        SELECT c.cw,
          CAST(floor(date_diff('day', CAST(c.cw AS DATE),
            CAST(date_trunc('week', e.ts) AS DATE)) / 7) AS BIGINT)
            AS week_offset,
          CAST(sum(CAST(e.value AS DECIMAL(18,2))) * 100 AS HUGEINT)
            AS wc
        FROM events e JOIN c USING (user_id)
        WHERE e.value IS NOT NULL
        GROUP BY 1, 2
      ), r AS (
        SELECT cw, week_offset,
          sum(wc) OVER (PARTITION BY cw ORDER BY week_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM wk
      )
      SELECT strftime(r.cw, '%Y-%m-%d') AS cohort_week, week_offset,
        sz.n_users,
        CAST(cum AS DOUBLE) / 100.0 AS cum_value,
        CAST(cum AS DOUBLE)
          / (100.0 * CAST(sz.n_users AS DOUBLE)) AS ltv_per_user
      FROM r JOIN sz ON r.cw = sz.cw
      ORDER BY cohort_week, week_offset""")) { (s, dir) =>
      Behavior.cohortLtv(Tables.load(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")
    },

    // Weekly cohort retention: distinct active users per
    // (first-event week, week offset).
    Q("q66_retention", Some("""
      WITH c AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY 1
      )
      SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
             CAST(floor(date_diff('day', CAST(c.cw AS DATE),
               CAST(date_trunc('week', e.ts) AS DATE)) / 7) AS BIGINT)
               AS week_offset,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      Behavior.weeklyRetention(Tables.load(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")
    }
  )
}
