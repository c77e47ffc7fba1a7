package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}
import graft.Tables

/** Order statistics and moment aggregates. Percentiles use exact
  * interpolated quantiles (Spark `percentile` ≡ DuckDB
  * `quantile_cont`); variance/stddev/correlation are computed from
  * exact decimal power sums and finished in double arithmetic — the
  * one-pass streaming formulas Spark's built-in `var_samp`/`corr` use
  * accumulate doubles in partition order and are NOT reproducible
  * bit-for-bit, so the engine recomputes them deterministically.
  */
object StatsQueries {

  val all: Seq[Q] = Seq(

    // Exact interpolated percentiles per group.
    Q("q47_percentiles", Some("""
      SELECT event_type,
        quantile_cont(value, 0.5) AS p50,
        quantile_cont(value, 0.9) AS p90,
        quantile_cont(value, 0.99) AS p99,
        CAST(MIN(value) AS DOUBLE) AS vmin,
        CAST(MAX(value) AS DOUBLE) AS vmax
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      e.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.9)).as("p90"),
          percentile(col("value"), lit(0.99)).as("p99"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        .orderBy("event_type")
    },

    // Deterministic moments: mean / sample variance / stddev /
    // correlation (value vs props.k) from exact decimal power sums.
    Q("q48_moments", Some("""
      SELECT event_type, CAST(n AS BIGINT) AS n, sx / n AS mean_value,
        (sxx - sx * sx / n) / (n - 1) AS var_value,
        sqrt((sxx - sx * sx / n) / (n - 1)) AS std_value,
        (n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
          AS corr_value_k
      FROM (
        SELECT event_type,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS DOUBLE) AS sy,
          CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
             * CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS DOUBLE) AS syy,
          CAST(SUM(CAST(value AS DECIMAL(18,2))
             * CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS DOUBLE) AS sxy
        FROM events GROUP BY event_type)
      ORDER BY event_type""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val dv = col("value").cast(DecimalType(18, 2))
      val k = from_json(col("props"),
        StructType(Seq(StructField("k", IntegerType)))).getField("k")
        .cast("long")
      val agg = e.groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(dv).cast("double").as("sx"),
          sum(dv * dv).cast("double").as("sxx"),
          sum(k).cast("double").as("sy"),
          sum(k * k).cast("double").as("syy"),
          sum(dv * k).cast("double").as("sxy"))
      agg.select(col("event_type"), col("n").cast("long").as("n"),
          (col("sx") / col("n")).as("mean_value"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)).as("var_value"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)).as("std_value"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_value_k"))
        .orderBy("event_type")
    },

    // Column profiler — the ANALYZE-statistics analog: one scan per
    // table computing rows/nulls/distincts/extremes per column (the
    // stats a cost-based optimizer or data catalog collects).
    {
      val cols = Seq("l_quantity", "l_discount", "l_returnflag",
        "l_shipdate")
      val duckRows = cols.map { c =>
        val mm = c match {
          case "l_shipdate" =>
            s"strftime(MIN($c), '%Y-%m-%d') AS min_value, strftime(MAX($c), '%Y-%m-%d') AS max_value"
          case "l_returnflag" =>
            s"MIN($c) AS min_value, MAX($c) AS max_value"
          case _ =>
            s"printf('%.2f', MIN($c)) AS min_value, printf('%.2f', MAX($c)) AS max_value"
        }
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $mm
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL ")
      Q("q54_profile", Some(s"""
      SELECT column_name, n_rows, n_nulls, n_distinct,
        min_value, max_value
      FROM ($duckRows) ORDER BY column_name""")) { (s, dir) =>
        val li = Tables.load(s, dir, "lineitem")
        // NB format AFTER min/max — formatting first would compare
        // strings lexicographically
        val fmt: String => org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
          case "l_shipdate" => date_format(_, "yyyy-MM-dd")
          case "l_returnflag" => identity
          case _ => format_string("%.2f", _)
        }
        cols.map { c =>
          li.agg(count(lit(1)).as("n_rows"),
              (count(lit(1)) - count(col(c))).as("n_nulls"),
              countDistinct(col(c)).as("n_distinct"),
              fmt(c)(min(col(c))).as("min_value"),
              fmt(c)(max(col(c))).as("max_value"))
            .select(lit(c).as("column_name"), col("n_rows"),
              col("n_nulls"), col("n_distinct"), col("min_value"),
              col("max_value"))
        }.reduce(_.unionByName(_)).orderBy("column_name")
      }
    },

    // Per-group OLS trend: daily slope / intercept / r² of event
    // value per type, from exact integer power sums (x = epoch day,
    // y scaled to cents). Spark's regr_* aggregates stream doubles
    // in partition order and cannot hash-match; this form is
    // bit-reproducible at any parallelism.
    Q("q136_group_ols", Some("""
      WITH b AS (
        SELECT event_type,
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      ), s AS (
        SELECT event_type, count(*) AS n,
          sum(CAST(x AS HUGEINT)) AS sx,
          sum(CAST(yc AS HUGEINT)) AS sy,
          sum(CAST(x * yc AS HUGEINT)) AS sxy,
          sum(CAST(x * x AS HUGEINT)) AS sxx,
          sum(CAST(yc * yc AS HUGEINT)) AS syy
        FROM b GROUP BY 1
      ), f AS (
        SELECT event_type, n,
          CAST(n * sxy - sx * sy AS DOUBLE) AS numd,
          CAST(n * sxx - sx * sx AS DOUBLE) AS dend,
          CAST(n * syy - sy * sy AS DOUBLE) AS denyd,
          CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
        FROM s
      )
      SELECT event_type, CAST(n AS BIGINT) AS n,
        CASE WHEN dend > 0 THEN numd / dend / 100.0 END AS slope,
        CASE WHEN dend > 0 THEN
          (syd / 100.0 - (numd / dend / 100.0) * sxd)
            / CAST(n AS DOUBLE) END AS intercept,
        CASE WHEN dend > 0 AND denyd > 0 THEN
          numd * numd / (dend * denyd) END AS r2
      FROM f ORDER BY event_type""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .where(col("ts").isNotNull)
        .withColumn("x",
          datediff(col("ts").cast("date"),
            to_date(lit("1970-01-01"))))
      graft.analytics.Regression.groupOls(e, "event_type", "x", "value")
    },

    // Exact ROC AUC / Gini / KS of a continuous score against a
    // binary label — here the stopword-ratio quality signal
    // predicting English. The engine side is the distributed
    // bucketed prefix-sum in [[graft.analytics.Evaluation]]; the
    // oracle is the textbook global-window rank sum — identical
    // exact-integer arithmetic, one double division per statistic.
    Q("q134_score_auc", Some("""
      WITH d AS (
        SELECT
          len(list_filter(t, x -> x IN ('the','a','of','and','to','in',
            'is','it','that','for')))::DOUBLE / len(t)::DOUBLE AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM (SELECT lang, string_split_regex(trim(text), '\s+') AS t
              FROM documents)
      ), g AS (
        SELECT score, count(*) AS cnt, sum(label) AS pos,
               count(*) - sum(label) AS neg
        FROM d WHERE score IS NOT NULL GROUP BY 1
      ), c AS (
        SELECT score, cnt, pos, neg,
          coalesce(sum(cnt) OVER w, 0) AS cb,
          coalesce(sum(pos) OVER w, 0) AS cbp,
          coalesce(sum(neg) OVER w, 0) AS cbn
        FROM g
        WINDOW w AS (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), t AS (
        SELECT sum(cnt) AS n, sum(pos) AS p, sum(neg) AS q FROM g
      ), a AS (
        SELECT
          sum(CAST(pos AS HUGEINT) * (2 * cb + cnt + 1)) AS s2,
          max(abs(CAST(cbp + pos AS HUGEINT) * (SELECT q FROM t)
                - CAST(cbn + neg AS HUGEINT) * (SELECT p FROM t)))
            AS ks_num
        FROM c
      )
      SELECT CAST(t.n AS BIGINT) AS n, CAST(t.p AS BIGINT) AS n_pos,
        CAST(t.q AS BIGINT) AS n_neg,
        CAST(a.s2 - CAST(t.p AS HUGEINT) * (t.p + 1) AS DOUBLE)
          / CAST(2 * CAST(t.p AS HUGEINT) * t.q AS DOUBLE) AS auc,
        2.0 * (CAST(a.s2 - CAST(t.p AS HUGEINT) * (t.p + 1) AS DOUBLE)
          / CAST(2 * CAST(t.p AS HUGEINT) * t.q AS DOUBLE)) - 1.0
          AS gini,
        CAST(a.ks_num AS DOUBLE)
          / CAST(CAST(t.p AS HUGEINT) * t.q AS DOUBLE) AS ks
      FROM t, a""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(
          graft.analytics.TextAnalysis.qualityProfile(col("text"))
            .getField("stop_ratio").as("score"),
          when(col("lang") === "en", 1).otherwise(0).as("label"))
      graft.analytics.Evaluation.scoreEval(d, "score", "label")
    },

    // KMV distinct-count sketch (native bounded-state aggregate with
    // map-side partials) vs exact COUNT(DISTINCT), per event type.
    // The oracle reproduces the k smallest md5-derived hashes and the
    // (k-1)*P/h_k arithmetic — the sketch is hash-deterministic.
    Q("q63_kmv_distinct", Some(s"""
      WITH src AS (
        SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
      h AS (
        SELECT DISTINCT event_type,
          CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${graft.analytics.Dedup.P} AS h
        FROM src),
      ranked AS (
        SELECT event_type, h,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM h),
      kmv AS (
        SELECT event_type,
          CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
               ELSE 63.0 * ${graft.analytics.Dedup.P} / MAX(h) END
            AS kmv_estimate
        FROM ranked WHERE rk <= 64 GROUP BY event_type),
      ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM src GROUP BY event_type)
      SELECT event_type,
        CAST(exact_distinct AS BIGINT) AS exact_distinct, kmv_estimate
      FROM ex JOIN kmv USING (event_type)
      ORDER BY event_type""")) { (s, dir) =>
      import graft.analytics.{Dedup, Sketches}
      Tables.load(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).cast("long").as("exact_distinct"),
          Sketches.kmvDistinct(
            Dedup.h30(col("user_id").cast("string")), 64)
            .as("kmv_estimate"))
        .orderBy("event_type")
    },

    // HyperLogLog distinct-count sketch (native constant-state
    // aggregate, byte-register max merge) vs exact COUNT(DISTINCT)
    // per event type. The oracle re-derives the 256 registers from
    // the same md5-derived 60-bit hash (bucket = top 8 bits, rho =
    // leading zeros of the 52-bit remainder + 1, via an exact
    // integer CASE ladder), computes the harmonic term as the exact
    // integer sum 2^(53-M), and replays the same estimate arithmetic.
    {
      val b = 8
      val m = 1 << b // 256
      val wBits = 60 - b // 52
      val wMask = (1L << wBits) - 1
      val alpha = graft.expressions.HllSketch.alpha(m) // 0.7213/(1+1.079/256)
      // rho = index of highest set bit from the top of the 52-bit
      // remainder: w >= 2^51 -> 1, ..., w >= 1 -> 52, w = 0 -> 53.
      val rhoCase = (0 until wBits).map { i =>
        s"WHEN w >= ${1L << (wBits - 1 - i)} THEN ${i + 1}"
      }.mkString("CASE ", " ", s" ELSE ${wBits + 1} END")
      Q("q123_hll_distinct", Some(s"""
      WITH src AS (
        SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
      h AS (
        SELECT DISTINCT event_type,
          CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS h
        FROM src),
      rho AS (
        SELECT event_type, h >> $wBits AS idx, $rhoCase AS rho
        FROM (SELECT event_type, h, h & $wMask AS w FROM h)),
      regs AS (
        SELECT g.event_type, r.range AS idx,
          COALESCE(MAX(rho.rho), 0) AS reg
        FROM (SELECT DISTINCT event_type FROM src) g
        CROSS JOIN range($m) r
        LEFT JOIN rho ON rho.event_type = g.event_type
          AND rho.idx = r.range
        GROUP BY 1, 2),
      est AS (
        SELECT event_type,
          SUM(CAST(1 AS BIGINT) << (${wBits + 1} - reg)) AS s,
          SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
        FROM regs GROUP BY event_type),
      fin AS (
        SELECT event_type,
          CAST($alpha AS DOUBLE) * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
            * CAST(${java.lang.Double.toString(
                graft.expressions.HllSketch.pow2(wBits + 1))} AS DOUBLE)
            / CAST(s AS DOUBLE)
            AS raw, zeros
        FROM est),
      ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM src GROUP BY event_type)
      SELECT ex.event_type,
        CAST(exact_distinct AS BIGINT) AS exact_distinct,
        CASE WHEN raw <= CAST(${2.5 * m} AS DOUBLE) AND zeros > 0
          THEN floor(CAST($m AS DOUBLE)
              * ln(CAST($m AS DOUBLE) / zeros)
              * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
            / CAST(1000000000 AS DOUBLE)
          ELSE raw END AS hll_estimate
      FROM ex JOIN fin USING (event_type)
      ORDER BY event_type""")) { (s, dir) =>
        import graft.analytics.{Dedup, Sketches}
        Tables.load(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).cast("long")
              .as("exact_distinct"),
            Sketches.hllDistinct(
              Dedup.h60(col("user_id").cast("string")), b)
              .as("hll_estimate"))
          .orderBy("event_type")
      }
    },

    // KMV set-operation sketches (Beyer et al. SIGMOD'07): estimate
    // the customer-set OVERLAP between two order years from three
    // k-minimum-value sketches — union estimate from the k-th
    // minimum, intersection from the match fraction ρ/k within the
    // union minima — alongside the exact intersect. The hash-reservoir
    // aggregate supplies the minima arrays in one pass; membership of
    // a union-minimum in each side's minima is exact (A ⊆ U ⇒ kth
    // min of A ≥ kth min of U). The oracle replays minima and
    // arithmetic from the same md5 hashes.
    {
      val k = 128
      val P = graft.analytics.Dedup.P
      val kp = java.lang.Double.toString(((k - 1).toLong * P).toDouble)
      Q("q132_kmv_overlap", Some(s"""
      WITH o AS (
        SELECT o_custkey AS ck, EXTRACT(year FROM o_orderdate) AS y
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1997-01-01'),
      ha AS (SELECT DISTINCT CAST('0x' || substr(md5(CAST(ck AS VARCHAR)),
        1, 8) AS BIGINT) % $P AS h FROM o WHERE y = 1995),
      hb AS (SELECT DISTINCT CAST('0x' || substr(md5(CAST(ck AS VARCHAR)),
        1, 8) AS BIGINT) % $P AS h FROM o WHERE y = 1996),
      hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
      ma AS (SELECT h FROM ha ORDER BY h LIMIT $k),
      mb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
      mu AS (SELECT h FROM hu ORDER BY h LIMIT $k),
      rho AS (
        SELECT COUNT(*) AS rho FROM mu
        WHERE h IN (SELECT h FROM ma) AND h IN (SELECT h FROM mb)),
      stats AS (SELECT COUNT(*) AS nu, MAX(h) AS hk FROM mu),
      ex AS (
        SELECT COUNT(*) AS exact_intersection FROM
          (SELECT ck FROM o WHERE y = 1995
           INTERSECT SELECT ck FROM o WHERE y = 1996))
      SELECT CAST(exact_intersection AS BIGINT) AS exact_intersection,
        CASE WHEN nu < $k THEN CAST(rho AS DOUBLE)
          ELSE (CAST(rho AS DOUBLE) / $k)
            * (CAST($kp AS DOUBLE) / hk) END AS est_intersection
      FROM ex, rho, stats""")) { (s, dir) =>
        import graft.analytics.{Dedup, Sketches}
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") >= "1995-01-01" &&
            col("o_orderdate") < "1997-01-01")
          .select(col("o_custkey").as("ck"),
            year(col("o_orderdate")).as("y"))
        val h = Dedup.h30(col("ck").cast("string"))
        val hd = h.cast("double")
        val sk = o.agg(
          Sketches.hashReservoir(when(col("y") === 1995, h),
            when(col("y") === 1995, hd), k).as("ma"),
          Sketches.hashReservoir(when(col("y") === 1996, h),
            when(col("y") === 1996, hd), k).as("mb"),
          Sketches.hashReservoir(h, hd, k).as("mu"))
        val exact = o.groupBy("ck")
          .agg(max(when(col("y") === 1995, 1).otherwise(0)).as("a"),
            max(when(col("y") === 1996, 1).otherwise(0)).as("b"))
          .where(col("a") === 1 && col("b") === 1)
          .agg(count(lit(1)).cast("long").as("exact_intersection"))
        val rho = size(array_intersect(
          array_intersect(col("mu"), col("ma")), col("mb")))
        val hk = element_at(col("mu"), size(col("mu")))
        exact.crossJoin(sk)
          .select(col("exact_intersection"),
            when(size(col("mu")) < k, rho.cast("double"))
              .otherwise((rho.cast("double") / lit(k)) *
                (lit(kp.toDouble) / hk)).as("est_intersection"))
      }
    },

    // Join-size estimation from count-min sketches (the classic CMS
    // inner-product application — Cormode & Muthukrishnan 2005 §4.2,
    // and what a CBO does before picking a join strategy): estimate
    // |lineitem ⋈ urgent-orders| from two key sketches WITHOUT
    // running the join, alongside the exact answer. est_i = Σ_b
    // cmsR[i][b]·cmsS[i][b]; the min over rows never undercounts.
    // All-integer arithmetic, replayed exactly by the oracle.
    // Width is sized to the key cardinality (inner-product error is
    // ~(e/w)·N_R·N_S): 64k counters × 4 rows = a 2 MB sketch —
    // still constant state however large the join sides grow.
    {
      val d = 4
      val w = 65536
      val coefRows = (0 until d).map { i =>
        val (a, b) = graft.analytics.Dedup.hashCoeffs(i)
        s"($i, $a, $b)"
      }.mkString(", ")
      val P = graft.analytics.Dedup.P
      Q("q131_cms_joinsize", Some(s"""
      WITH coef (i, a, b) AS (VALUES $coefRows),
      rkeys AS (
        SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
          1, 8) AS BIGINT) % $P AS h
        FROM lineitem),
      skeys AS (
        SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
          1, 8) AS BIGINT) % $P AS h
        FROM orders WHERE o_orderpriority = '1-URGENT'),
      rb AS (
        SELECT coef.i AS i, ((coef.a * h + coef.b) % $P) % $w AS bucket,
          COUNT(*) AS c
        FROM rkeys CROSS JOIN coef GROUP BY 1, 2),
      sb AS (
        SELECT coef.i AS i, ((coef.a * h + coef.b) % $P) % $w AS bucket,
          COUNT(*) AS c
        FROM skeys CROSS JOIN coef GROUP BY 1, 2),
      prod AS (
        SELECT rb.i, SUM(rb.c * sb.c) AS ip
        FROM rb JOIN sb ON rb.i = sb.i AND rb.bucket = sb.bucket
        GROUP BY rb.i),
      ex AS (
        SELECT COUNT(*) AS exact_join_size
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT')
      SELECT CAST(exact_join_size AS BIGINT) AS exact_join_size,
        CAST((SELECT MIN(ip) FROM prod) AS BIGINT) AS cms_estimate
      FROM ex""")) { (s, dir) =>
        import graft.analytics.{Dedup, Sketches}
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT")
        val skR = li.agg(Sketches.cmsSketch(
          Dedup.h30(col("l_orderkey").cast("string")), d, w).as("r"))
        val skS = ord.agg(Sketches.cmsSketch(
          Dedup.h30(col("o_orderkey").cast("string")), d, w).as("s"))
        val exact = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).cast("long").as("exact_join_size"))
        val prods = (0 until d).map { i =>
          aggregate(
            slice(zip_with(col("r"), col("s"), (x, y) => x * y),
              i * w + 1, w),
            lit(0L), (acc, x) => acc + x)
        }
        exact.crossJoin(skR.crossJoin(skS))
          .select(col("exact_join_size"),
            least(prods: _*).cast("long").as("cms_estimate"))
      }
    },

    // Quantile winsorization stats per event type: values clipped at
    // [p05, p95], reporting clip counts and the winsorized mean. The
    // mean is assembled deterministically from an exact decimal
    // mid-range sum plus count×boundary double products (the clipped
    // values themselves are interpolated doubles, so a naive
    // SUM(clipped) would be summation-order-dependent).
    // Cramér's V association between two categoricals (event type ×
    // ISO weekday): χ² from exact counts — per-cell terms
    // (n·o − r·c)²/(n·r·c) are double-finished from exact integers
    // and summed by a CELL-SORTED fold (float addition is not
    // associative; an unordered SUM could never hash-match), then
    // V = sqrt(χ² / (n·(min(R,C)−1))).
    Q("q155_cramers_v", Some("""
      WITH o AS (
        SELECT event_type AS a, CAST(isodow(CAST(ts AS DATE)) AS INT)
            AS b,
          CAST(count(*) AS BIGINT) AS o
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
      ), r AS (SELECT a, sum(o) AS ra FROM o GROUP BY 1),
      c AS (SELECT b, sum(o) AS cb FROM o GROUP BY 1),
      t AS (SELECT sum(o) AS n, count(DISTINCT a) AS nr,
                   count(DISTINCT b) AS nc FROM o),
      cells AS (
        SELECT o.a, o.b,
          CAST(CAST(t.n AS HUGEINT) * o.o - CAST(r.ra AS HUGEINT)
              * c.cb AS DOUBLE)
          * CAST(CAST(t.n AS HUGEINT) * o.o - CAST(r.ra AS HUGEINT)
              * c.cb AS DOUBLE)
          / CAST(CAST(t.n AS HUGEINT) * r.ra * c.cb AS DOUBLE)
            AS term
        FROM o JOIN r USING (a) JOIN c USING (b), t
      ), chi AS (
        SELECT list_reduce(
          list_prepend(0.0, list(term ORDER BY a, b)),
          (acc, x) -> acc + x) AS chi2
        FROM cells
      )
      SELECT CAST(t.n AS BIGINT) AS n,
        CAST(t.nr AS BIGINT) AS n_rows_cat,
        CAST(t.nc AS BIGINT) AS n_cols_cat,
        chi.chi2,
        sqrt(chi.chi2 / (CAST(t.n AS DOUBLE)
          * CAST(least(t.nr, t.nc) - 1 AS DOUBLE))) AS cramers_v
      FROM t, chi""")) { (s, dir) =>
      val o = Tables.load(s, dir, "events")
        .where(col("ts").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type").as("a"),
          (weekday(col("ts").cast("date")) + 1).as("b"))
        .agg(count(lit(1)).as("o"))
      val r = o.groupBy("a").agg(sum("o").as("ra"))
      val c = o.groupBy("b").agg(sum("o").as("cb"))
      val t = o.agg(sum("o").as("n"),
        countDistinct("a").as("nr"), countDistinct("b").as("nc"))
      val D38 = DecimalType(38, 0)
      def dd(x: org.apache.spark.sql.Column) = x.cast(D38)
      val num = (dd(col("n")) * col("o") -
        dd(col("ra")) * col("cb")).cast("double")
      val term = num * num /
        (dd(col("n")) * col("ra") * col("cb")).cast("double")
      val cells = o.join(r, Seq("a")).join(c, Seq("b"))
        .crossJoin(broadcast(t))
        .select(col("a"), col("b"), term.as("term"))
      // cell-sorted fold: identical IEEE chain to the oracle's
      // list_reduce over list(term ORDER BY a, b)
      val chi = cells
        .agg(sort_array(collect_list(
          struct(col("a"), col("b"), col("term")))).as("__l"))
        .select(aggregate(col("__l"), lit(0.0),
          (acc, x) => acc + x.getField("term")).as("chi2"))
        .crossJoin(broadcast(t))
        .select(col("chi2"), col("n"), col("nr"), col("nc"))
      chi.select(col("n").cast("long").as("n"),
        col("nr").cast("long").as("n_rows_cat"),
        col("nc").cast("long").as("n_cols_cat"),
        col("chi2"),
        sqrt(col("chi2") / (col("n").cast("double") *
          (least(col("nr"), col("nc")) - 1).cast("double")))
          .as("cramers_v"))
    },

    // One-pass Pearson correlation matrix over the lineitem numeric
    // columns: ALL pairwise power sums (4 sums, 4 sums-of-squares,
    // 6 cross products — 15 aggregates) accumulate in a SINGLE
    // aggregation job over one scan, listwise-complete rows, exact
    // integer cents; each correlation is a fixed double sequence
    // (sqrt is correctly rounded everywhere). The naive per-pair
    // corr() would scan the fact 6 times and stream partition-order
    // doubles.
    {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val centsSql = cols.map(c =>
        s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT) AS $c")
        .mkString(", ")
      val sumsSql = (cols.map(c =>
        s"sum(CAST($c AS HUGEINT)) AS s_$c, " +
          s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c") ++
        pairs.map { case (a, b) =>
          s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b" })
        .mkString(", ")
      val rowsSql = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
          CAST(n AS BIGINT) AS n,
          CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE)
            / (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE))
             * sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE)))
            AS corr FROM agg"""
      }.mkString(" UNION ALL ")
      Q("q148_corr_matrix", Some(s"""
      WITH src AS (
        SELECT $centsSql FROM lineitem WHERE $notNull
      ), agg AS (
        SELECT count(*) AS n, $sumsSql FROM src
      )
      SELECT col_a, col_b, n, corr FROM ($rowsSql) t
      ORDER BY col_a, col_b""")) { (s, dir) =>
        val D38 = DecimalType(38, 0)
        def d(c: org.apache.spark.sql.Column) = c.cast(D38)
        val src = Tables.load(s, dir, "lineitem")
          .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
          .select(cols.map(c =>
            (Q.dec(col(c)) * 100).cast("long").as(c)): _*)
        val aggs =
          Seq(count(lit(1)).as("n")) ++
          cols.flatMap(c => Seq(
            sum(d(col(c))).as(s"s_$c"),
            sum(d(col(c) * col(c))).as(s"ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum(d(col(a) * col(b))).as(s"sp_${a}_$b") }
        val agg = src.agg(aggs.head, aggs.tail: _*)
        val rows = pairs.map { case (a, b) =>
          struct(lit(a).as("col_a"), lit(b).as("col_b"),
            col("n").as("n"),
            ((d(col("n")) * col(s"sp_${a}_$b") -
                col(s"s_$a") * col(s"s_$b")).cast("double") /
              (sqrt((d(col("n")) * col(s"ss_$a") -
                  col(s"s_$a") * col(s"s_$a")).cast("double")) *
               sqrt((d(col("n")) * col(s"ss_$b") -
                  col(s"s_$b") * col(s"s_$b")).cast("double"))))
              .as("corr"))
        }
        agg.select(explode(array(rows: _*)).as("r"))
          .select(col("r.col_a").as("col_a"), col("r.col_b").as("col_b"),
            col("r.n").as("n"), col("r.corr").as("corr"))
          .orderBy("col_a", "col_b")
      }
    },

    // Two-proportion z-test on user-level conversion (arm = user
    // parity, converted = any purchase): the categorical A/B readout
    // next to q140's Welch-on-means. All counts exact BIGINTs; the
    // z expression uses only correctly-rounded IEEE ops (+,−,×,÷,√),
    // so raw doubles hash-match with no quantization.
    Q("q207_two_proportion", Some("""
      WITH u AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS conv
        FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      c AS (
        SELECT
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1
            ELSE 0 END) AS BIGINT) AS conv_a,
          CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_b,
          CAST(SUM(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1
            ELSE 0 END) AS BIGINT) AS conv_b
        FROM u)
      SELECT n_a, conv_a, n_b, conv_b,
        CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        CASE WHEN n_a > 0 AND n_b > 0
            AND CAST(conv_a + conv_b AS DOUBLE)
              / CAST(n_a + n_b AS DOUBLE) > 0
            AND CAST(conv_a + conv_b AS DOUBLE)
              / CAST(n_a + n_b AS DOUBLE) < 1 THEN
          (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
          / sqrt((CAST(conv_a + conv_b AS DOUBLE)
              / CAST(n_a + n_b AS DOUBLE))
            * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
              / CAST(n_a + n_b AS DOUBLE))
            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        END AS z
      FROM c""")) { (s, dir) =>
      val users = Tables.load(s, dir, "events")
        .where(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(max((col("event_type") === "purchase").cast("int"))
          .as("conv"))
      graft.analytics.Evaluation.twoProportionZ(users,
        col("user_id") % 2 === 0, col("conv") === 1)
    },

    // Mann–Whitney U (rank-sum) of each event type's value
    // distribution vs the complement — the nonparametric
    // significance companion to q172's KS/Wasserstein: midranks in
    // exact 2× integer units over the cent grid (value-domain
    // window, never a row sort), tie-corrected normal z from the
    // exact sums.
    Q("q208_mann_whitney", Some("""
      WITH c AS (
        SELECT event_type AS g,
          CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v,
          CAST(count(*) AS BIGINT) AS c
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2),
      pv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM c GROUP BY 1),
      gt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM c),
      rk AS (
        SELECT v, cv, COALESCE(SUM(cv) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS below
        FROM pv),
      r2 AS (SELECT v, 2 * below + cv + 1 AS r2 FROM rk),
      pg AS (
        SELECT g, SUM(CAST(c.c AS HUGEINT) * r2) AS rsum2,
          CAST(SUM(c.c) AS BIGINT) AS na
        FROM c JOIN r2 USING (v) GROUP BY g),
      tt AS (
        SELECT SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS t3 FROM pv)
      SELECT g, na AS n_a, CAST(n_tot - na AS BIGINT) AS n_b,
        CAST(rsum2 - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
        CASE WHEN na > 0 AND n_tot > na AND
            CAST(na AS DOUBLE) * CAST(n_tot - na AS DOUBLE) / 12.0
              * ((CAST(n_tot AS DOUBLE) + 1.0)
                - CAST(t3 AS DOUBLE) / (CAST(n_tot AS DOUBLE)
                  * (CAST(n_tot AS DOUBLE) - 1.0))) > 0 THEN
          (CAST(rsum2 - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE)
              / 2.0
            - CAST(na AS DOUBLE) * CAST(n_tot - na AS DOUBLE) / 2.0)
          / sqrt(CAST(na AS DOUBLE) * CAST(n_tot - na AS DOUBLE)
              / 12.0
            * ((CAST(n_tot AS DOUBLE) + 1.0)
              - CAST(t3 AS DOUBLE) / (CAST(n_tot AS DOUBLE)
                * (CAST(n_tot AS DOUBLE) - 1.0))))
        END AS z
      FROM pg CROSS JOIN gt CROSS JOIN tt ORDER BY g""")) { (s, dir) =>
      graft.analytics.Evaluation.mannWhitneyU(
        Tables.load(s, dir, "events"), "event_type", "value")
    },

    // A/B experiment readout: deterministic 50/50 user assignment by
    // the portable hash, per-USER value totals as the experimental
    // unit (testing raw events against a user-level assignment is
    // the classic unit-of-analysis error), Welch's t + df from exact
    // integer power sums.
    {
      import graft.analytics.Dedup
      Q("q140_ab_welch", Some(s"""
      WITH u AS (
        SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${Dedup.P} % 2 AS v,
          CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
      ), g AS (
        SELECT v, count(*) AS n, sum(CAST(yc AS HUGEINT)) AS sy,
          sum(CAST(yc AS HUGEINT) * yc) AS syy
        FROM u GROUP BY 1
      ), s AS (
        SELECT max(CASE WHEN v = 0 THEN n END) AS na,
               max(CASE WHEN v = 1 THEN n END) AS nb,
               max(CASE WHEN v = 0 THEN sy END) AS sa,
               max(CASE WHEN v = 1 THEN sy END) AS sb,
               max(CASE WHEN v = 0 THEN syy END) AS ssa,
               max(CASE WHEN v = 1 THEN syy END) AS ssb
        FROM g
      ), m AS (
        SELECT coalesce(na, 0) AS n_a, coalesce(nb, 0) AS n_b,
          CAST(sa AS DOUBLE) / 100.0 / CAST(na AS DOUBLE) AS mean_a,
          CAST(sb AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE) AS mean_b,
          CASE WHEN na >= 2 THEN
            CAST(na * ssa - sa * sa AS DOUBLE)
              / CAST(CAST(na AS HUGEINT) * (na - 1) AS DOUBLE)
              / 10000.0 END AS var_a,
          CASE WHEN nb >= 2 THEN
            CAST(nb * ssb - sb * sb AS DOUBLE)
              / CAST(CAST(nb AS HUGEINT) * (nb - 1) AS DOUBLE)
              / 10000.0 END AS var_b
        FROM s
      ), f AS (
        SELECT *, var_a / CAST(n_a AS DOUBLE) AS vna,
               var_b / CAST(n_b AS DOUBLE) AS vnb
        FROM m
      )
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        mean_a, mean_b, var_a, var_b,
        CASE WHEN (vna + vnb) > 0 THEN
          (mean_a - mean_b) / sqrt(vna + vnb) END AS t_stat,
        CASE WHEN (vna + vnb) > 0 AND n_a >= 2 AND n_b >= 2 THEN
          (vna + vnb) * (vna + vnb)
            / (vna * vna / (CAST(n_a AS DOUBLE) - 1.0)
             + vnb * vnb / (CAST(n_b AS DOUBLE) - 1.0)) END
          AS welch_df
      FROM f""")) { (s, dir) =>
        val perUser = Tables.load(s, dir, "events")
          .where(col("value").isNotNull && col("user_id").isNotNull)
          .groupBy("user_id")
          .agg((sum(Q.dec(col("value"))) * 100).cast("long").as("yc"))
          .withColumn("v",
            (Dedup.h30(col("user_id").cast("string")) % 2).cast("int"))
        graft.analytics.Evaluation.welchTTest(perUser, "v", "yc")
      }
    },

    // Hampel robust outliers: per-type median, MAD, and the count
    // beyond 3·1.4826·MAD — the outlier detector whose threshold the
    // outliers themselves cannot move (50% breakdown point, vs 0%
    // for mean/stddev z-scores).
    Q("q139_mad_outliers", Some("""
      WITH src AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM src GROUP BY event_type),
      d AS (
        SELECT src.event_type, med, abs(value - med) AS dev
        FROM src JOIN m USING (event_type)),
      md AS (
        SELECT event_type, med, quantile_cont(dev, 0.5) AS mad
        FROM d GROUP BY event_type, med)
      SELECT d.event_type, CAST(count(*) AS BIGINT) AS n, md.med,
        md.mad,
        CAST(sum(CASE WHEN dev > mad * CAST(1.4826 AS DOUBLE)
            * CAST(3.0 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers,
        CAST(sum(CASE WHEN dev > mad * CAST(1.4826 AS DOUBLE)
            * CAST(3.0 AS DOUBLE) THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS outlier_ratio
      FROM d JOIN md USING (event_type)
      GROUP BY d.event_type, md.med, md.mad
      ORDER BY d.event_type""")) { (s, dir) =>
      graft.analytics.Histograms.madOutliers(
        Tables.load(s, dir, "events"), col("value"),
        Seq("event_type"), k = 3.0)
        .orderBy("event_type")
    },

    Q("q129_winsorize", Some("""
      WITH src AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL),
      b AS (
        SELECT event_type,
          quantile_cont(value, 0.05) AS p05,
          quantile_cont(value, 0.95) AS p95
        FROM src GROUP BY event_type),
      j AS (
        SELECT src.event_type, value, p05, p95
        FROM src JOIN b USING (event_type))
      SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_lo,
        CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hi,
        (CAST(SUM(CASE WHEN value >= p05 AND value <= p95
            THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
          + SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) * p05
          + SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) * p95)
          / COUNT(*) AS winsor_mean,
        p05, p95
      FROM j GROUP BY event_type, p05, p95
      ORDER BY event_type""")) { (s, dir) =>
      import graft.analytics.Histograms
      val clipped = Histograms.clipQuantiles(
        Tables.load(s, dir, "events"), col("value"),
        Seq("event_type"), 0.05, 0.95)
      clipped.groupBy(col("event_type"),
          col("__p_lo").as("p05"), col("__p_hi").as("p95"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("value") < col("__p_lo"), 1L).otherwise(0L))
            .as("n_lo"),
          sum(when(col("value") > col("__p_hi"), 1L).otherwise(0L))
            .as("n_hi"),
          sum(when(col("value") >= col("__p_lo") &&
              col("value") <= col("__p_hi"), Q.dec(col("value"))))
            .cast("double").as("s_mid"))
        .select(col("event_type"), col("n"),
          col("n_lo").cast("long").as("n_lo"),
          col("n_hi").cast("long").as("n_hi"),
          ((col("s_mid") + col("n_lo") * col("p05")
            + col("n_hi") * col("p95")) / col("n")).as("winsor_mean"),
          col("p05"), col("p95"))
        .orderBy("event_type")
    },

    // Count-min sketch point-frequency estimates (native constant-
    // state aggregate, element-wise-add merge) vs exact counts for
    // the corpus's top-8 tokens. All-integer arithmetic — the oracle
    // replays the d×w counters and the min-probe exactly.
    {
      val d = 4
      val w = 1024
      val coefRows = (0 until d).map { i =>
        val (a, b) = graft.analytics.Dedup.hashCoeffs(i)
        s"($i, $a, $b)"
      }.mkString(", ")
      Q("q128_cms_freq", Some(s"""
      WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE text IS NOT NULL),
      cnt AS (
        SELECT tok,
          CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
            % ${graft.analytics.Dedup.P} AS h,
          COUNT(*) AS c
        FROM toks GROUP BY 1, 2),
      top AS (SELECT tok, h, c FROM cnt ORDER BY c DESC, tok LIMIT 8),
      coef (i, a, b) AS (VALUES $coefRows),
      buckets AS (
        SELECT coef.i AS i,
          ((coef.a * cnt.h + coef.b) % ${graft.analytics.Dedup.P}) % $w
            AS bucket,
          SUM(c) AS cval
        FROM cnt CROSS JOIN coef GROUP BY 1, 2),
      probe AS (
        SELECT top.tok, top.c, coef.i AS i,
          ((coef.a * top.h + coef.b) % ${graft.analytics.Dedup.P}) % $w
            AS bucket
        FROM top CROSS JOIN coef),
      est AS (
        SELECT tok, c, MIN(cval) AS est
        FROM probe JOIN buckets USING (i, bucket) GROUP BY 1, 2)
      SELECT tok, CAST(c AS BIGINT) AS exact_count,
        CAST(est AS BIGINT) AS cms_estimate
      FROM est ORDER BY exact_count DESC, tok""")) { (s, dir) =>
        import graft.analytics.{Dedup, Sketches}
        val toks = Tables.load(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(8)
        val sketch = toks.agg(
          Sketches.cmsSketch(Dedup.h30(col("tok")), d, w).as("__cms"))
        top.crossJoin(broadcast(sketch))
          .select(col("tok"), col("c").cast("long").as("exact_count"),
            Sketches.cmsEstimate(col("__cms"), Dedup.h30(col("tok")),
              d, w).cast("long").as("cms_estimate"))
          .orderBy(col("exact_count").desc, col("tok"))
      }
    },

    // Equi-width + equi-depth histograms over l_extendedprice (the
    // distribution-shape statistics a catalog/CBO collects on top of
    // q54's profiler): one scalar job builds the bucket model
    // (min/max resp. the 9 exact decile boundaries), broadcast into
    // a <=10-key map-side-combined groupBy. The oracle replays the
    // identical IEEE bucket arithmetic.
    {
      val k = 10
      val frs = (1 until k).map(i =>
        s"CAST(${java.lang.Double.toString(i.toDouble / k)} AS DOUBLE)")
        .mkString("[", ", ", "]")
      Q("q126_histograms", Some(s"""
      WITH v AS (
        SELECT l_extendedprice AS x FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      st AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM v),
      wrows AS (
        SELECT CASE WHEN hi = lo THEN 0
            ELSE CAST(LEAST(floor((x - lo) / ((hi - lo) / $k)),
              ${k - 1}) AS INT) END AS bucket, lo, hi
        FROM v, st),
      wgrp AS (
        SELECT 'width' AS hist_type, bucket,
          lo + bucket * ((hi - lo) / $k) AS lo_b,
          lo + (bucket + 1) * ((hi - lo) / $k) AS hi_b
        FROM wrows),
      w AS (
        SELECT hist_type, bucket, lo_b, hi_b, COUNT(*) AS n
        FROM wgrp GROUP BY 1, 2, 3, 4),
      qs AS (
        SELECT quantile_cont(x, $frs) AS bs,
          MIN(x) AS lo, MAX(x) AS hi
        FROM v),
      drows AS (
        SELECT CAST(len(list_filter(bs, b -> x > b)) AS INT) AS bucket,
          bs, lo, hi
        FROM v, qs),
      dgrp AS (
        SELECT 'depth' AS hist_type, bucket,
          CASE WHEN bucket = 0 THEN lo ELSE bs[bucket] END AS lo_b,
          CASE WHEN bucket = ${k - 1} THEN hi
            ELSE bs[bucket + 1] END AS hi_b
        FROM drows),
      d AS (
        SELECT hist_type, bucket, lo_b, hi_b, COUNT(*) AS n
        FROM dgrp GROUP BY 1, 2, 3, 4)
      SELECT hist_type, bucket, lo_b AS lo, hi_b AS hi,
        CAST(n AS BIGINT) AS n_rows
      FROM (SELECT * FROM w UNION ALL SELECT * FROM d)
      ORDER BY hist_type, bucket""")) { (s, dir) =>
        import graft.analytics.Histograms
        val li = Tables.load(s, dir, "lineitem")
        val wHist = Histograms.equiWidth(li, col("l_extendedprice"), k)
          .select(lit("width").as("hist_type"), col("bucket"),
            col("lo"), col("hi"), col("n_rows"))
        val dHist = Histograms.equiDepth(li, col("l_extendedprice"), k)
          .select(lit("depth").as("hist_type"), col("bucket"),
            col("lo"), col("hi"), col("n_rows"))
        wHist.unionByName(dHist).orderBy("hist_type", "bucket")
      }
    },

    // Bounded-state quantile estimation: a deterministic hash-reservoir
    // (native aggregate, k smallest (h30(event_id), value) pairs, O(k)
    // state per group with map-side partials) replaces the full
    // per-group value shuffle exact `percentile` needs at corpus
    // scale. Exact quantiles ride along so the result row itself
    // exposes the estimation error. The oracle re-derives the same k
    // pairs from the same md5 arithmetic and the same discrete
    // quantile index.
    {
      val K = 64
      Q("q107_quantile_sketch", Some(s"""
      WITH src AS (
        SELECT event_type, event_id, value FROM events
        WHERE value IS NOT NULL),
      h AS (
        SELECT DISTINCT event_type,
          CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${graft.analytics.Dedup.P} AS h, value
        FROM src),
      ranked AS (
        SELECT event_type, h, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, value)
            AS rk
        FROM h),
      samp AS (
        SELECT event_type, list(value ORDER BY h, value) AS s
        FROM ranked WHERE rk <= $K GROUP BY event_type),
      qs AS (
        SELECT event_type, CAST(len(s) AS BIGINT) AS n_sample,
          list_sort(s)[CAST(floor(0.5 * (len(s) - 1)) AS INT) + 1]
            AS est_p50,
          list_sort(s)[CAST(floor(0.9 * (len(s) - 1)) AS INT) + 1]
            AS est_p90
        FROM samp),
      ex AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
          quantile_cont(value, 0.5) AS exact_p50,
          quantile_cont(value, 0.9) AS exact_p90
        FROM src GROUP BY event_type)
      SELECT event_type, n_rows, n_sample, est_p50, est_p90,
        exact_p50, exact_p90
      FROM ex JOIN qs USING (event_type) ORDER BY event_type""")) {
        (s, dir) =>
        import graft.analytics.{Dedup, Sketches}
        Tables.load(s, dir, "events")
          .filter(col("value").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            Sketches.hashReservoir(
              Dedup.h30(col("event_id").cast("string")),
              col("value"), K).as("__s"),
            percentile(col("value"), lit(0.5)).as("exact_p50"),
            percentile(col("value"), lit(0.9)).as("exact_p90"))
          .select(col("event_type"), col("n_rows"),
            size(col("__s")).cast("long").as("n_sample"),
            Sketches.sampleQuantile(col("__s"), 0.5).as("est_p50"),
            Sketches.sampleQuantile(col("__s"), 0.9).as("est_p90"),
            col("exact_p50"), col("exact_p90"))
          .orderBy("event_type")
      }
    },

    // Distribution drift per event type: exact Kolmogorov–Smirnov and
    // exact 1-Wasserstein distance of each type's value distribution
    // against the complement (drift audit — "does this slice's metric
    // distribution differ from everyone else's, and by how much").
    // Values snap losslessly to the 2-decimal cent grid, so the dense
    // per-group CDF frame is GRID-bounded (range × 100 values),
    // independent of row count — the only corpus-sized job is the
    // first (type, cents) count shuffle. Both statistics are exact
    // BIGINT numerators over n_a·n_b, divided once at the end.
    Q("q172_value_drift", Some("""
      WITH base AS (
        SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      ), pergv AS (
        SELECT g, vc, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2
      ), perv AS (
        SELECT vc, CAST(SUM(c) AS BIGINT) AS cv FROM pergv GROUP BY 1
      ), grp AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n_a FROM pergv GROUP BY 1
      ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM pergv
      ), frame AS (
        SELECT grp.g, grp.n_a, tot.n_tot, perv.vc, perv.cv,
          COALESCE(pergv.c, 0) AS c
        FROM grp CROSS JOIN tot CROSS JOIN perv
        LEFT JOIN pergv ON pergv.g = grp.g AND pergv.vc = perv.vc
      ), scored AS (
        SELECT g, n_a, n_tot - n_a AS n_b,
          SUM(c) OVER w AS cum_a,
          SUM(cv) OVER w - SUM(c) OVER w AS cum_b,
          COALESCE(LEAD(vc) OVER w - vc, 0) AS gap
        FROM frame
        WINDOW w AS (PARTITION BY g ORDER BY vc)
      ), d AS (
        SELECT g, n_a, n_b,
          abs(cum_a * n_b - cum_b * n_a) AS diff, gap
        FROM scored)
      SELECT g AS event_type, CAST(n_a AS BIGINT) AS n_a,
        CAST(n_b AS BIGINT) AS n_b,
        CAST(MAX(diff) AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks,
        CAST(SUM(gap * diff) AS DOUBLE)
          / CAST(n_a * n_b * 100 AS DOUBLE) AS w1
      FROM d GROUP BY g, n_a, n_b ORDER BY event_type""")) { (s, dir) =>
      graft.analytics.Evaluation.distributionDrift(
          Tables.load(s, dir, "events"), "event_type", "value",
          cents = 100)
        .withColumnRenamed("g", "event_type")
    },

    // The sketch aggregates through the SQL-ONLY surface (q227's
    // contract extended to aggregates): pure spark.sql text using the
    // extension-registered kmv_distinct / hll_distinct / cms_sketch —
    // proof a SQL-only consumer gets the identical bounded-state
    // aggregates the DataFrame API (Sketches.*) builds, against the
    // same replayed-arithmetic oracles as q63/q123/q128.
    Q("q231_sql_kmv", Some(s"""
      WITH src AS (
        SELECT l_returnflag, l_partkey FROM lineitem
        WHERE l_partkey IS NOT NULL),
      h AS (
        SELECT DISTINCT l_returnflag,
          CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
            AS BIGINT) % ${graft.analytics.Dedup.P} AS h
        FROM src),
      ranked AS (
        SELECT l_returnflag, h,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        FROM h),
      kmv AS (
        SELECT l_returnflag,
          CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
               ELSE 63.0 * ${graft.analytics.Dedup.P} / MAX(h) END
            AS kmv_estimate
        FROM ranked WHERE rk <= 64 GROUP BY 1),
      ex AS (
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
        FROM src GROUP BY 1)
      SELECT l_returnflag,
        CAST(exact_distinct AS BIGINT) AS exact_distinct, kmv_estimate
      FROM ex JOIN kmv USING (l_returnflag)
      ORDER BY l_returnflag""")) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("q231_li")
      s.sql(s"""
        SELECT l_returnflag,
          CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
          kmv_distinct(
            CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 8),
              16, 10) AS BIGINT) % ${graft.analytics.Dedup.P}, 64)
            AS kmv_estimate
        FROM q231_li WHERE l_partkey IS NOT NULL
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    },

    // hll_distinct via SQL: per-priority distinct customers, 256
    // registers; the oracle re-derives registers/rho/harmonic-term
    // with the q123 exact-integer replay, retargeted at orders.
    {
      val b = 8
      val m = 1 << b
      val wBits = 60 - b
      val wMask = (1L << wBits) - 1
      val alpha = graft.expressions.HllSketch.alpha(m)
      val rhoCase = (0 until wBits).map { i =>
        s"WHEN w >= ${1L << (wBits - 1 - i)} THEN ${i + 1}"
      }.mkString("CASE ", " ", s" ELSE ${wBits + 1} END")
      Q("q232_sql_hll", Some(s"""
      WITH src AS (
        SELECT o_orderpriority AS g, o_custkey AS k FROM orders
        WHERE o_custkey IS NOT NULL),
      h AS (
        SELECT DISTINCT g,
          CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
            AS BIGINT) AS h
        FROM src),
      rho AS (
        SELECT g, h >> $wBits AS idx, $rhoCase AS rho
        FROM (SELECT g, h, h & $wMask AS w FROM h)),
      regs AS (
        SELECT gg.g, r.range AS idx, COALESCE(MAX(rho.rho), 0) AS reg
        FROM (SELECT DISTINCT g FROM src) gg
        CROSS JOIN range($m) r
        LEFT JOIN rho ON rho.g = gg.g AND rho.idx = r.range
        GROUP BY 1, 2),
      est AS (
        SELECT g, SUM(CAST(1 AS BIGINT) << (${wBits + 1} - reg)) AS s,
          SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
        FROM regs GROUP BY g),
      fin AS (
        SELECT g,
          CAST($alpha AS DOUBLE) * CAST($m AS DOUBLE) * CAST($m AS DOUBLE)
            * CAST(${java.lang.Double.toString(
                graft.expressions.HllSketch.pow2(wBits + 1))} AS DOUBLE)
            / CAST(s AS DOUBLE) AS raw, zeros
        FROM est),
      ex AS (
        SELECT g, COUNT(DISTINCT k) AS exact_distinct FROM src GROUP BY g)
      SELECT ex.g AS o_orderpriority,
        CAST(exact_distinct AS BIGINT) AS exact_distinct,
        CASE WHEN raw <= CAST(${2.5 * m} AS DOUBLE) AND zeros > 0
          THEN floor(CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / zeros)
              * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
            / CAST(1000000000 AS DOUBLE)
          ELSE raw END AS hll_estimate
      FROM ex JOIN fin USING (g)
      ORDER BY o_orderpriority""")) { (s, dir) =>
        Tables.load(s, dir, "orders").createOrReplaceTempView("q232_o")
        s.sql(s"""
          SELECT o_orderpriority,
            CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
            hll_distinct(
              CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 15),
                16, 10) AS BIGINT), $b) AS hll_estimate
          FROM q232_o WHERE o_custkey IS NOT NULL
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }
    },

    // cms_sketch via SQL: one corpus-wide d×w counter array over
    // part brands, probed for the top-8 brands with the min-probe
    // written as plain SQL least(element_at(...)) — the estimate
    // arithmetic a SQL-only consumer would write (the DataFrame twin
    // is Sketches.cmsEstimate). All-integer; q128's oracle pattern
    // retargeted at part.
    {
      val d = 4
      val w = 1024
      val p = graft.analytics.Dedup.P
      val coefRows = (0 until d).map { i =>
        val (a, b) = graft.analytics.Dedup.hashCoeffs(i)
        s"($i, $a, $b)"
      }.mkString(", ")
      val probes = (0 until d).map { i =>
        val (a, b) = graft.analytics.Dedup.hashCoeffs(i)
        s"element_at(sk, CAST(${i * w} + (h * ${a}L + ${b}L) % ${p}L" +
          s" % $w + 1 AS INT))"
      }.mkString("least(", ", ", ")")
      Q("q233_sql_cms", Some(s"""
      WITH cnt AS (
        SELECT p_brand,
          CAST('0x' || substr(md5(p_brand), 1, 8) AS BIGINT)
            % $p AS h,
          COUNT(*) AS c
        FROM part WHERE p_brand IS NOT NULL GROUP BY 1, 2),
      top AS (SELECT p_brand, h, c FROM cnt
        ORDER BY c DESC, p_brand LIMIT 8),
      coef (i, a, b) AS (VALUES $coefRows),
      buckets AS (
        SELECT coef.i AS i, ((coef.a * cnt.h + coef.b) % $p) % $w
            AS bucket,
          SUM(c) AS cval
        FROM cnt CROSS JOIN coef GROUP BY 1, 2),
      probe AS (
        SELECT top.p_brand, top.c, coef.i AS i,
          ((coef.a * top.h + coef.b) % $p) % $w AS bucket
        FROM top CROSS JOIN coef),
      est AS (
        SELECT p_brand, c, MIN(cval) AS est
        FROM probe JOIN buckets USING (i, bucket) GROUP BY 1, 2)
      SELECT p_brand, CAST(c AS BIGINT) AS exact_count,
        CAST(est AS BIGINT) AS cms_estimate
      FROM est ORDER BY exact_count DESC, p_brand""")) { (s, dir) =>
        Tables.load(s, dir, "part").createOrReplaceTempView("q233_p")
        s.sql(s"""
          WITH cms AS (
            SELECT cms_sketch(
              CAST(conv(substring(md5(p_brand), 1, 8), 16, 10)
                AS BIGINT) % ${p}L, $d, $w) AS sk
            FROM q233_p WHERE p_brand IS NOT NULL),
          top AS (
            SELECT p_brand,
              CAST(conv(substring(md5(p_brand), 1, 8), 16, 10)
                AS BIGINT) % ${p}L AS h,
              CAST(count(*) AS BIGINT) AS exact_count
            FROM q233_p WHERE p_brand IS NOT NULL
            GROUP BY p_brand
            ORDER BY exact_count DESC, p_brand LIMIT 8)
          SELECT /*+ BROADCAST(cms) */ p_brand, exact_count,
            CAST($probes AS BIGINT) AS cms_estimate
          FROM top CROSS JOIN cms
          ORDER BY exact_count DESC, p_brand""")
      }
    }
  )
}
