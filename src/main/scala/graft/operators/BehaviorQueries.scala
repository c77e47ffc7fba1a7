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
