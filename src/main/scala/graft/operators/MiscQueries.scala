package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.analytics.Dedup

/** Breadth tier: set operations, edit-distance fuzzy matching, and
  * reproducible dataset splitting.
  */
object MiscQueries {

  val all: Seq[Q] = Seq(

    // Proportion estimation with Wilson score intervals (the CI that
    // behaves at small n and extreme p, unlike the Wald interval):
    // per-nation order-conversion rate — customers with ≥1 order —
    // with 95% bounds. Exact integer counts; the interval is a fixed
    // IEEE sequence (sqrt is correctly rounded everywhere), z ships
    // as a string-parsed literal per the shared-constant contract.
    Q("q149_conversion_ci", Some("""
      WITH conv AS (
        SELECT c.c_nationkey,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0
            END) AS BIGINT) AS k
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey
        GROUP BY 1
      ), w AS (
        SELECT n_name, n, k,
          CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
          CAST('1.96' AS DOUBLE) AS z,
          CAST(n AS DOUBLE) AS nd
        FROM conv JOIN nation ON n_nationkey = c_nationkey
      )
      SELECT n_name, n, k, p,
        ((p + z * z / (2.0 * nd))
          - z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd)))
          / (1.0 + z * z / nd) AS ci_lo,
        ((p + z * z / (2.0 * nd))
          + z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd)))
          / (1.0 + z * z / nd) AS ci_hi
      FROM w ORDER BY n_name""")) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ordered = Tables.load(s, dir, "orders")
        .select(col("o_custkey")).distinct()
      val conv = cust
        .join(ordered, col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L))
            .as("k"))
      val nat = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val p = col("k").cast("double") / col("n").cast("double")
      val z = lit(1.96)
      val nd = col("n").cast("double")
      val a = p + z * z / (lit(2.0) * nd)
      val b = z * sqrt(p * (lit(1.0) - p) / nd +
        z * z / (lit(4.0) * nd * nd))
      val c = lit(1.0) + z * z / nd
      conv.join(broadcast(nat), col("n_nationkey") === col("c_nationkey"))
        .select(col("n_name"), col("n"), col("k"), p.as("p"),
          ((a - b) / c).as("ci_lo"), ((a + b) / c).as("ci_hi"))
        .orderBy("n_name")
    },

    // INTERSECT / EXCEPT set operations: build customers who ordered
    // in 1998 vs customers in the BUILDING segment.
    Q("q51_set_ops", Some("""
      WITH ordered98 AS (
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n FROM
        (SELECT * FROM ordered98 INTERSECT SELECT * FROM building)
      UNION ALL
      SELECT 'ordered_only', CAST(COUNT(*) AS BIGINT) FROM
        (SELECT * FROM ordered98 EXCEPT SELECT * FROM building)
      UNION ALL
      SELECT 'building_only', CAST(COUNT(*) AS BIGINT) FROM
        (SELECT * FROM building EXCEPT SELECT * FROM ordered98)
      ORDER BY cohort""")) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey")).distinct()
      val b = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val counts = Seq(
        ("both", o.intersect(b)),
        ("ordered_only", o.except(b)),
        ("building_only", b.except(o)))
      counts.map { case (name, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(name).as("cohort"),
          col("n"))
      }.reduce(_.unionByName(_)).orderBy("cohort")
    },

    // Fuzzy dictionary matching via levenshtein: noisy brand labels
    // (vowels stripped) resolved to the nearest clean brand — the
    // edit-distance upgrade of F10 crop-name standardization. The
    // dictionary side is broadcast; per-label argmin via window.
    Q("q52_fuzzy_match", Some("""
      WITH dict AS (SELECT DISTINCT p_brand FROM part),
      noisy AS (
        SELECT DISTINCT regexp_replace(p_brand, '[ae]', '', 'g') AS label
        FROM part)
      SELECT label, p_brand AS matched, CAST(dist AS INT) AS dist FROM (
        SELECT n.label, d.p_brand,
          levenshtein(n.label, d.p_brand) AS dist,
          ROW_NUMBER() OVER (PARTITION BY n.label
            ORDER BY levenshtein(n.label, d.p_brand), d.p_brand) AS rn
        FROM noisy n CROSS JOIN dict d) t
      WHERE rn = 1 ORDER BY label""")) { (s, dir) =>
      val part = Tables.load(s, dir, "part")
      val dict = part.select("p_brand").distinct()
      val noisy = part
        .select(regexp_replace(col("p_brand"), "[ae]", "").as("label"))
        .distinct()
      val w = Window.partitionBy("label")
        .orderBy(col("dist"), col("p_brand"))
      // Exact argmin WITHOUT an n×|dict| cartesian: levenshtein(a,b) >=
      // |length(a)-length(b)| (pigeonhole), so any dictionary entry
      // outside a ±D length band sits at distance > D. Phase 1 joins
      // each label only to entries in its band (equi-join on a length
      // bucket exploded per dict row); a banded winner with dist <= D
      // is provably the GLOBAL argmin with exact tie semantics — every
      // candidate tying at dist <= D has |Δlen| <= D and is in the
      // band, and every excluded entry is strictly farther. Labels the
      // band cannot settle (no candidate, or banded min > D) fall back
      // to a broadcast nested-loop pass over the full dictionary:
      // still exact, still no CartesianProduct node, and at scale the
      // fallback side is the rare residue, not the corpus. The
      // dictionary is a bounded vocabulary (a fuzzy-match dict by
      // construction), so broadcasting it — and its 2D+1 exploded
      // buckets — is safe.
      val maxD = 3
      val banded = dict.withColumn("len_bucket",
        explode(sequence(length(col("p_brand")) - maxD,
          length(col("p_brand")) + maxD)))
      val win1 = noisy
        .join(broadcast(banded), length(col("label")) === col("len_bucket"))
        .withColumn("dist", levenshtein(col("label"), col("p_brand")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("dist") <= maxD)
        .select("label", "p_brand", "dist")
      val win2 = noisy
        .join(win1.select("label"), Seq("label"), "left_anti")
        .crossJoin(broadcast(dict))
        .withColumn("dist", levenshtein(col("label"), col("p_brand")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("label", "p_brand", "dist")
      win1.unionByName(win2)
        .select(col("label"), col("p_brand").as("matched"),
          col("dist").cast("int").as("dist"))
        .orderBy("label")
    },

    // Reproducible train/val/test split by portable content hash —
    // stable across engines, runs, and partitionings (unlike
    // rand()-based sampling), the standard trick for dataset splits.
    Q("q53_train_split", Some(s"""
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM (
        SELECT CASE
            WHEN h % 10 < 8 THEN 'train'
            WHEN h % 10 = 8 THEN 'validation'
            ELSE 'test' END AS split, n_chars
        FROM (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                % ${Dedup.P} AS h, n_chars
              FROM documents))
      GROUP BY split ORDER BY split""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val h = Dedup.h30(col("doc_id").cast("string"))
      d.select(
          when(h % 10 < 8, "train")
            .when(h % 10 === 8, "validation")
            .otherwise("test").as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("split")
    },

    // Deterministic source-mix rebalancing: cap every language at 60
    // docs chosen by portable-hash order (Sampling.capPerGroup) — the
    // reproducible form of "equalize languages before training".
    Q("q62_balanced_sample", Some(s"""
      WITH ranked AS (
        SELECT lang, n_chars,
          ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % ${Dedup.P}, doc_id) AS rk
        FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
        CAST(SUM(CASE WHEN rk <= 60 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN rk <= 60 THEN n_chars ELSE 0 END) AS BIGINT)
          AS kept_chars
      FROM ranked GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      // ONE grouped aggregation computes totals AND the kept sample:
      // the native TopKByHash aggregate keeps the 60 smallest
      // (h30, doc_id) rows per language with map-side partials, so
      // nothing but bounded per-group state crosses the exchange —
      // the window-rank formulation (the oracle's) shuffles every
      // row. Row-identical, incl. the (hash, id) tie-break.
      // Nulls-last ordering matches DuckDB's ASC default; the fold
      // coalesces null n_chars to 0 to mirror SUM's null-skip.
      val d = Tables.load(s, dir, "documents")
      d.groupBy("lang").agg(
          count(lit(1)).as("n_total"),
          graft.analytics.Sampling.topKByHash(60,
            graft.analytics.Dedup.h30(col("doc_id").cast("string")),
            col("doc_id"), "n_chars" -> col("n_chars")).as("__kept"))
        .select(col("lang"), col("n_total"),
          size(col("__kept")).cast("long").as("n_kept"),
          aggregate(col("__kept"), lit(0L),
            (a, x) => a + coalesce(x.getField("n_chars"), lit(0L)))
            .as("kept_chars"))
        .orderBy(col("lang").asc_nulls_last)
    },

    // Deterministic mixture sampling: per-source keep-fractions — the
    // domain-mixing step of corpus assembly. src0 (the benchmark
    // stand-in, q68) is excluded entirely, other sources keep graded
    // shares. Thresholds are integer literals generated driver-side
    // into BOTH plans, so membership is identical integer arithmetic
    // in Spark and DuckDB.
    {
      val fr = Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 0.25)
      val defaultFr = 0.1
      val denom = 1000000
      val cases = fr.toSeq.sortBy(_._1)
        .map { case (g, f) => s"WHEN '$g' THEN ${(f * denom).toLong}" }
        .mkString(" ")
      Q("q80_mixture_sample", Some(s"""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) % ${graft.analytics.Dedup.P} % $denom
        < CASE source $cases ELSE ${(defaultFr * denom).toLong} END
      GROUP BY source ORDER BY source""")) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
        graft.analytics.Sampling.mixtureSample(d, "source",
            col("doc_id"), fr, defaultFraction = defaultFr,
            denom = denom)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"))
          .orderBy("source")
      }
    },

    // Sharded JSONL export + read-back manifest: the corpus is written
    // as `shard=N/` JSONL directories (the loader-facing interchange
    // format) and the manifest is computed from what was READ BACK
    // from disk — matching the oracle (which reads the parquet source)
    // proves the sink round-trips documents losslessly, not merely
    // that the write call returned. Map-only export: the shard is a
    // derived partition column, so rows never shuffle.
    {
      val S = 8
      Q("q106_export_manifest", Some(s"""
      SELECT CAST(doc_id % $S AS BIGINT) AS shard,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
          AS n_tokens,
        CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
        CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        CAST(MAX(doc_id) AS BIGINT) AS max_doc
      FROM documents GROUP BY 1 ORDER BY shard""")) { (s, dir) =>
        val out = Q.scratchPath("q106jsonl", dir)
        val back = graft.warehouse.Writer.exportJsonlSharded(
          Tables.load(s, dir, "documents"), "doc_id", out, shards = S)
        back.groupBy(col("shard").cast("long").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(trim(col("text")), "\\s+")).cast("long"))
              .as("n_tokens"),
            sum(octet_length(col("text")).cast("long")).as("n_bytes"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy("shard")
      }
    },

    // Small-files compaction plan over a per-(day, hour) file
    // inventory derived from events (bytes = Σ 32 + |props| per
    // hour-file): exclusive-prefix fill assigns each file to the
    // target-sized output group its preceding bytes land in — one
    // partition-local window cumsum, no global sort, no first-fit
    // loop whose bins depend on iteration order. All BIGINTs; the
    // partition is a formatted day string per the Q date contract.
    {
      val target = 32768L
      Q("q179_compaction_plan", Some(s"""
      WITH files AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS part,
          CAST(hour(ts) AS BIGINT) AS file_id,
          CAST(SUM(32 + COALESCE(strlen(props), 0)) AS BIGINT) AS bytes
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
      ), pre AS (
        SELECT part, file_id, bytes,
          COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
        FROM files)
      SELECT part, CAST(p // $target AS BIGINT) AS out_group,
        CAST(count(*) AS BIGINT) AS n_files,
        CAST(SUM(bytes) AS BIGINT) AS group_bytes,
        MIN(file_id) AS first_file, MAX(file_id) AS last_file
      FROM pre GROUP BY 1, 2 ORDER BY part, out_group""")) { (s, dir) =>
        val inv = Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("part"),
            hour(col("ts")).cast("long").as("file_id"))
          .agg(sum(lit(32L) +
            coalesce(octet_length(col("props")).cast("long"), lit(0L)))
            .as("bytes"))
        graft.warehouse.Writer.compactionPlan(
          inv, "part", "file_id", "bytes", targetBytes = target)
      }
    },

    // Shuffle-skew forecast for a join key: row counts per hash
    // partition (portable h30 bucketing, 32 partitions — the
    // session's shuffle.partitions) for lineitem.l_partkey. A
    // partition far above the mean is the q113-salting trigger; the
    // report costs one aggregation instead of a mis-planned join.
    Q("q221_shuffle_skew", Some(s"""
      SELECT CAST((CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
          1, 8) AS BIGINT) % ${Dedup.P}) % 32 AS INT) AS partition,
        CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem WHERE l_partkey IS NOT NULL
      GROUP BY 1 ORDER BY partition""")) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .where(col("l_partkey").isNotNull)
        .groupBy(pmod(Dedup.h30(col("l_partkey").cast("string")),
          lit(32L)).cast("int").as("partition"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("partition")
    },

    // Functional-dependency profile on the corpus metadata: does
    // source determine language (it doesn't — multi-lingual
    // sources), does language determine source, does doc_id
    // determine source (clean key FD as the control)? Per
    // candidate: distinct-pair aggregation, exact counts, one
    // division — the schema-discovery contract check.
    Q("q223_fd_profile", Some("""
      WITH sl AS (
        SELECT k, CAST(count(*) AS BIGINT) AS fan FROM (
          SELECT DISTINCT source AS k, lang AS v FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL)
        GROUP BY k),
      ls AS (
        SELECT k, CAST(count(*) AS BIGINT) AS fan FROM (
          SELECT DISTINCT lang AS k, source AS v FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL)
        GROUP BY k),
      ds AS (
        SELECT k, CAST(count(*) AS BIGINT) AS fan FROM (
          SELECT DISTINCT doc_id AS k, source AS v FROM documents
          WHERE doc_id IS NOT NULL AND source IS NOT NULL)
        GROUP BY k)
      SELECT 'doc_id' AS lhs, 'source' AS rhs,
        CAST(count(*) AS BIGINT) AS n_keys,
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating,
        CAST(MAX(fan) AS BIGINT) AS max_fanout,
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS violation_rate
      FROM ds
      UNION ALL
      SELECT 'lang', 'source', CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(MAX(fan) AS BIGINT),
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE)
      FROM ls
      UNION ALL
      SELECT 'source', 'lang', CAST(count(*) AS BIGINT),
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(MAX(fan) AS BIGINT),
        CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE)
      FROM sl
      ORDER BY lhs, rhs""")) { (s, dir) =>
      graft.analytics.Histograms.fdProfile(
        Tables.load(s, dir, "documents"),
        Seq("doc_id" -> "source", "lang" -> "source",
          "source" -> "lang"))
    },

    // Per-source quality scorecard — the curator's one-page report,
    // as ONE composition query: volume, token mass, long-doc and
    // exact-duplicate counts (corpus-wide hash groups, so a source
    // is charged for copies it shares with OTHER sources), and the
    // majority language with its share. Every number exact until
    // the two final divisions.
    Q("q209_source_scorecard", Some("""
      WITH d AS (
        SELECT source, doc_id, lang, n_chars,
          len(string_split_regex(trim(text), '\s+')) AS toks,
          md5(text) AS h
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
      hc AS (SELECT h, count(*) AS hc FROM d GROUP BY 1),
      lng AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM d WHERE lang IS NOT NULL GROUP BY 1, 2),
      top AS (
        SELECT source, lang AS top_lang, c AS top_c FROM (
          SELECT source, lang, c, row_number() OVER (
            PARTITION BY source ORDER BY c DESC, lang DESC) AS rn
          FROM lng) WHERE rn = 1),
      agg AS (
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          CAST(SUM(toks) AS BIGINT) AS total_tokens,
          CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_long,
          CAST(SUM(CASE WHEN hc.hc > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_exact_dup
        FROM d JOIN hc USING (h) GROUP BY 1)
      SELECT agg.source, n_docs, total_chars, total_tokens,
        CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
          AS mean_tokens,
        n_long, n_exact_dup, top.top_lang,
        CAST(top.top_c AS DOUBLE) / CAST(n_docs AS DOUBLE)
          AS top_lang_share
      FROM agg JOIN top USING (source)
      ORDER BY source""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"),
          size(split(trim(col("text")), "\\s+")).cast("long")
            .as("toks"),
          md5(col("text")).as("h"))
      val hc = d.groupBy("h").agg(count(lit(1)).as("hc"))
      val top = d.where(col("lang").isNotNull)
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(max(struct(col("c"), col("lang"))).as("t"))
        .select(col("source"), col("t.lang").as("top_lang"),
          col("t.c").as("top_c"))
      d.join(hc, Seq("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("toks")).as("total_tokens"),
          sum((col("n_chars") >= 300).cast("long")).as("n_long"),
          sum((col("hc") > 1).cast("long")).as("n_exact_dup"))
        .join(top, Seq("source"))
        .select(col("source"), col("n_docs"),
          col("total_chars").cast("long"),
          col("total_tokens").cast("long"),
          (col("total_tokens").cast("double") /
            col("n_docs").cast("double")).as("mean_tokens"),
          col("n_long").cast("long"), col("n_exact_dup").cast("long"),
          col("top_lang"),
          (col("top_c").cast("double") / col("n_docs").cast("double"))
            .as("top_lang_share"))
        .orderBy("source")
    },

    // User-journey dedup: per 30-minute session, the ordered
    // event-type path; how many distinct sessions share each
    // journey (the behavioral analogue of exact text dedup). Path
    // assembly uses the order-free collect + array_sort recipe, so
    // partitioning cannot permute a journey.
    Q("q210_journey_dedup", Some("""
      WITH s AS (
        SELECT user_id, event_id, event_type, ts,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), t AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
          AS session_idx
        FROM s
      ), j AS (
        SELECT user_id, session_idx,
          string_agg(event_type, '>' ORDER BY ts, event_id)
            AS journey
        FROM t GROUP BY 1, 2)
      SELECT journey, CAST(count(*) AS BIGINT) AS n_sessions,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM j GROUP BY 1
      ORDER BY n_sessions DESC, journey LIMIT 20""")) { (s, dir) =>
      val sess = graft.analytics.Behavior.sessionize(
        Tables.load(s, dir, "events")
          .where(col("user_id").isNotNull), 1800L)
      sess
        .groupBy("user_id", "session_idx")
        .agg(array_join(transform(
          array_sort(collect_list(struct(
            unix_micros(col("ts")).as("t"), col("event_id"),
            col("event_type")))),
          x => x("event_type")), ">").as("journey"))
        .groupBy("journey")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_sessions").desc, col("journey"))
        .limit(20)
    },

    // Incremental aggregate-view maintenance: per-event-type
    // count/sum/max state built from pre-cutoff events, merged with
    // the post-cutoff delta's aggregate through ONE full-outer join —
    // the oracle aggregates the full table directly. Different
    // algorithms, bit-exact totals (DECIMAL sums, order-free max).
    Q("q197_agg_delta_merge", Some("""
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS cnt,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum,
        CAST(MAX(epoch_us(ts)) AS BIGINT) AS mx
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1 ORDER BY event_type""")) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .where(col("event_type").isNotNull && col("ts").isNotNull)
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type").agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).as("sum"),
          max(unix_micros(col("ts"))).as("mx"))
      graft.warehouse.Merge.mergeAggStates(
          aggOf(e.where(col("ts") < cutoff)),
          aggOf(e.where(col("ts") >= cutoff)),
          Seq("event_type"))
        .select(col("event_type"), col("cnt").cast("long"),
          col("sum").cast("double").as("sum"),
          col("mx").cast("long").as("mx"))
        .orderBy("event_type")
    },

    // Per-language percent-rank normalization of document length:
    // "top decile of EVERY language" needs within-stratum ranks, and
    // percent_rank's (rank-1)/(n-1) tie-sharing definition matches
    // across engines with no quantization.
    Q("q198_percent_rank", Some("""
      SELECT doc_id AS id, lang AS g, CAST(n_chars AS BIGINT) AS v,
        percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
          AS pr
      FROM documents
      WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL
      ORDER BY id""")) { (s, dir) =>
      graft.analytics.Histograms.percentRankNormalize(
          Tables.load(s, dir, "documents")
            .withColumn("n_chars", col("n_chars").cast("long")),
          "lang", "n_chars", "doc_id")
        .orderBy("id")
    },

    // Stratified 5-fold cross-validation assignment: within each
    // source, docs are ranked by the portable hash and dealt
    // round-robin, so every (source, fold) cell is balanced within
    // ±1 — the query emits the cell counts as the balance proof,
    // with min/max doc ids pinning the actual assignment.
    Q("q192_stratified_folds", Some("""
      WITH a AS (
        SELECT doc_id, source,
          CAST((row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5
            AS INT) AS fold
        FROM documents
        WHERE doc_id IS NOT NULL AND source IS NOT NULL)
      SELECT source, fold, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        CAST(MAX(doc_id) AS BIGINT) AS max_doc
      FROM a GROUP BY 1, 2 ORDER BY source, fold""")) { (s, dir) =>
      graft.analytics.Sampling.stratifiedFolds(
          Tables.load(s, dir, "documents"), "doc_id", "source", k = 5)
        .groupBy(col("strata").as("source"), col("fold"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("source", "fold")
    },

    // Greedy token-budget corpus selection: best-scored docs first
    // (n_chars as the integer quality key, md5 hash order inside a
    // tie) until 12k tokens are spent. Spark runs the two-phase
    // value-domain cumsum + boundary-only ranking (never a global
    // corpus sort); the oracle runs the naive single-window prefix —
    // different algorithms, identical selected set.
    Q("q191_token_budget", Some("""
      WITH d AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
            AS toks
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
          AND text IS NOT NULL),
      r AS (
        SELECT doc_id, score, toks,
          SUM(toks) OVER (ORDER BY score DESC,
            md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM d)
      SELECT doc_id, score, toks FROM r WHERE cum <= 12000
      ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
        .withColumn("toks",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.analytics.Sampling.tokenBudgetSelect(d, "doc_id",
        "n_chars", "toks", budget = 12000L)
    },

    // Mixture-weighted selection: the q191 greedy budget run under
    // PER-SOURCE token budgets (the data-mixture spec of a training
    // run; sources missing from the mixture are dropped). Spark runs
    // the two-phase value-domain cumsum per group; the oracle runs
    // the naive per-group window prefix — identical selected set.
    {
      val budgets = Map("src1" -> 900L, "src3" -> 500L, "src7" -> 300L)
      val budgetValues = budgets.toSeq.sortBy(_._1)
        .map { case (g, b) => s"('$g', $b)" }.mkString(", ")
      Q("q242_mixture_select", Some(s"""
      WITH d AS (
        SELECT doc_id, source AS g, CAST(n_chars AS BIGINT) AS score,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS toks
        FROM documents
        WHERE doc_id IS NOT NULL AND source IS NOT NULL
          AND n_chars IS NOT NULL AND text IS NOT NULL),
      b AS (SELECT * FROM (VALUES $budgetValues) AS t(g, budget)),
      r AS (
        SELECT d.doc_id, d.g, d.score, d.toks, b.budget,
          SUM(d.toks) OVER (PARTITION BY d.g ORDER BY d.score DESC,
            md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM d JOIN b USING (g))
      SELECT doc_id, g AS source, score, toks FROM r
      WHERE cum <= budget
      ORDER BY doc_id""")) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
          .where(col("text").isNotNull)
          .withColumn("toks",
            size(split(trim(col("text")), "\\s+")).cast("long"))
        graft.analytics.Sampling.mixtureSelect(d, "doc_id", "source",
            "n_chars", "toks", budgets)
          .withColumnRenamed("g", "source")
      }
    },

    // Mixture PLAN (the sizing run before q242's selection): per
    // source, available vs target tokens (target = floor(w*B),
    // computed once driver-side and baked into both plans as the
    // same literal) and the DoReMi-style repeat factor. One
    // aggregation + a broadcast literal join.
    {
      val weights = Map("src1" -> 0.5, "src2" -> 0.3, "src5" -> 0.2)
      val totalBudget = 3000L
      val targetRows = weights.toSeq.sortBy(_._1)
        .map { case (g, w) =>
          s"('$g', ${math.floor(w * totalBudget).toLong})" }
        .mkString(", ")
      Q("q247_mixture_plan", Some(s"""
      WITH d AS (
        SELECT source AS g,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS toks
        FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
      avail AS (
        SELECT g, CAST(SUM(toks) AS BIGINT) AS available_tokens
        FROM d GROUP BY g),
      t AS (SELECT * FROM (VALUES $targetRows) AS v(g, target_tokens))
      SELECT g, available_tokens,
        CAST(target_tokens AS BIGINT) AS target_tokens,
        CAST(target_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE)
          AS repeat_factor,
        CASE WHEN target_tokens > available_tokens THEN 'repeat'
             WHEN target_tokens < available_tokens THEN 'subsample'
             ELSE 'exact' END AS action
      FROM avail JOIN t USING (g)
      ORDER BY g""")) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
          .where(col("text").isNotNull)
          .withColumn("toks",
            size(split(trim(col("text")), "\\s+")).cast("long"))
        graft.analytics.Sampling.mixturePlan(d, "source", "toks",
            weights, totalBudget)
          .orderBy("g")
      }
    },

    // Token-balanced shard manifest: equal-TOKEN shards via the
    // distributed global-cumsum (per-bucket offsets + bucket-local
    // windows — no global sort), vs q106's doc-count doc_id % S. The
    // oracle runs the naive single-window prefix over the same
    // (bucket, md5, id) order — different algorithm, identical
    // assignment.
    Q("q246_token_shards", Some(s"""
      WITH d AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS toks,
          (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${Dedup.P}) % 8 AS bucket,
          md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      r AS (
        SELECT doc_id, toks,
          COALESCE(SUM(toks) OVER (ORDER BY bucket, ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS pre
        FROM d)
      SELECT CAST(pre // 2000 AS BIGINT) AS shard,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(toks) AS BIGINT) AS n_tokens
      FROM r GROUP BY 1 ORDER BY shard""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
        .withColumn("toks",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.warehouse.Writer.tokenBalancedShards(d, "doc_id", "toks",
          shardTokens = 2000L, buckets = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"))
        .orderBy("shard")
    },

    // Incremental shard append: new docs (doc_id % 5 == 0, the q78
    // ingest-batch convention) fill the token-balanced shard layout
    // FROM the existing corpus's total token mass — the first new doc
    // lands in the existing partial tail shard and no existing
    // assignment moves (append-only, spec-pinned). Output: combined
    // per-shard manifest with the batch's contribution.
    Q("q250_shard_append", Some(s"""
      WITH d AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS toks,
          (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${Dedup.P}) % 8 AS bucket,
          md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      old AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
      nw AS (SELECT * FROM d WHERE doc_id % 5 = 0),
      base AS (SELECT COALESCE(SUM(toks), 0) AS b FROM old),
      ro AS (
        SELECT doc_id, toks, 0 AS is_new,
          COALESCE(SUM(toks) OVER (ORDER BY bucket, ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS pre
        FROM old),
      rn AS (
        SELECT doc_id, toks, 1 AS is_new,
          (SELECT b FROM base)
          + COALESCE(SUM(toks) OVER (ORDER BY bucket, ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS pre
        FROM nw),
      u AS (SELECT * FROM ro UNION ALL SELECT * FROM rn)
      SELECT CAST(pre // 2000 AS BIGINT) AS shard,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(is_new) AS BIGINT) AS n_new,
        CAST(SUM(toks) AS BIGINT) AS n_tokens
      FROM u GROUP BY 1 ORDER BY shard""")) { (s, dir) =>
      import graft.warehouse.Writer
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
        .withColumn("toks",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      val old = d.where(pmod(col("doc_id"), lit(5L)) =!= 0L)
      val nw = d.where(pmod(col("doc_id"), lit(5L)) === 0L)
      // one scalar aggregate: the existing corpus's total token mass
      // (in production this is read from the existing manifest)
      val base = old.agg(coalesce(sum(col("toks")), lit(0L)))
        .collect()(0).getLong(0)
      val oldAssign = Writer.tokenBalancedShards(old, "doc_id", "toks",
          shardTokens = 2000L, buckets = 8)
        .withColumn("is_new", lit(0L))
      val newAssign = Writer.tokenBalancedShardsAppend(nw, "doc_id",
          "toks", shardTokens = 2000L, buckets = 8, baseTokens = base)
        .withColumn("is_new", lit(1L))
      oldAssign.unionByName(newAssign)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_new")).as("n_new"),
          sum(col("toks")).as("n_tokens"))
        .orderBy("shard")
    },

    // Corpus snapshot diff — the governance query between two corpus
    // versions (old = doc_id % 5 != 0, new = the batch convention's
    // complement flipped: here new snapshot = everything except
    // doc_id % 7 == 0, so adds, removals, AND content changes all
    // occur): per source, docs added / removed / changed (content
    // hash moved) / unchanged. One full outer join on doc_id over
    // md5(text) — a plain hash exchange at any size.
    Q("q253_corpus_diff", Some("""
      WITH old AS (
        SELECT doc_id, source, md5(text) AS h FROM documents
        WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
      nw AS (
        SELECT doc_id, source,
          md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                   ELSE text END) AS h
        FROM documents
        WHERE doc_id % 7 <> 0 AND text IS NOT NULL),
      d AS (
        SELECT COALESCE(o.source, n.source) AS source,
          CASE WHEN o.doc_id IS NULL THEN 'added'
               WHEN n.doc_id IS NULL THEN 'removed'
               WHEN o.h <> n.h THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN nw n USING (doc_id))
      SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY 1, 2 ORDER BY source, status""")) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
      val old = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0L)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val nw = docs.where(pmod(col("doc_id"), lit(7L)) =!= 0L)
        .select(col("doc_id"), col("source"),
          md5(when(pmod(col("doc_id"), lit(11L)) === 0L,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
            .as("h"))
      graft.warehouse.Snapshot.corpusDiff(old, nw, "doc_id", "h")
        .groupBy("source", "status")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "status")
    },

    // Training-order shuffle audit: within 8 hash buckets of the
    // deterministic md5 emit order, count adjacent same-source pairs
    // — per-bucket windows, never one global sort; the 7 boundary
    // pairs are deliberately uncounted. The oracle replays the h30
    // bucketing and the (ord, id) window verbatim.
    Q("q187_shuffle_audit", Some(s"""
      WITH r AS (
        SELECT doc_id AS id, source AS g,
          md5(CAST(doc_id AS VARCHAR)) AS ord,
          (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % ${Dedup.P}) % 8 AS bucket
        FROM documents
        WHERE doc_id IS NOT NULL AND source IS NOT NULL
      ), adj AS (
        SELECT bucket, g,
          LAG(g) OVER (PARTITION BY bucket ORDER BY ord, id) AS pg
        FROM r)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(*) - 1 AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN g = pg THEN 1 ELSE 0 END) AS BIGINT)
          AS n_same_adj
      FROM adj GROUP BY bucket ORDER BY bucket""")) { (s, dir) =>
      graft.analytics.Sampling.shuffleAudit(
        Tables.load(s, dir, "documents"), "doc_id", "source",
        buckets = 8)
    },

    // Per-shard domain mixture entropy: are the q106-style output
    // shards source-balanced? H = -Σ p ln p per shard over the
    // source mix, each term quantized to 1e-12 units from the same
    // two BIGINTs and summed exactly. Uniform over 20 sources would
    // read ln 20 ≈ 3.0.
    Q("q188_shard_entropy", Some("""
      WITH d AS (
        SELECT doc_id % 8 AS shard, source FROM documents
        WHERE doc_id IS NOT NULL AND source IS NOT NULL),
      c AS (
        SELECT shard, source, CAST(count(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
      t AS (SELECT shard, CAST(SUM(c) AS BIGINT) AS n
            FROM c GROUP BY 1),
      e AS (
        SELECT shard, n,
          CAST(round(-(CAST(c AS DOUBLE) / n) *
            ln(CAST(c AS DOUBLE) / n) * 1000000000000.0) AS BIGINT)
            AS fp
        FROM c JOIN t USING (shard))
      SELECT shard AS g, n AS n_rows,
        CAST(count(*) AS BIGINT) AS n_labels,
        CAST(SUM(fp) AS DOUBLE) / 1000000000000.0 AS entropy
      FROM e GROUP BY shard, n ORDER BY g""")) { (s, dir) =>
      graft.analytics.Evaluation.groupEntropy(
        Tables.load(s, dir, "documents")
          .select((col("doc_id") % 8).as("shard"), col("source")),
        "shard", "source")
    },

    // Cohen's kappa between two quality raters (char-length gate vs
    // token-count gate) — the signal-redundancy audit for filter
    // stacks: four exact confusion counts, one double division.
    Q("q189_rater_kappa", Some("""
      WITH r AS (
        SELECT n_chars >= 300 AS a,
          len(string_split_regex(trim(text), '\s+')) >= 50 AS b
        FROM documents),
      conf AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
            AS both_pos,
          CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
            AS BIGINT) AS both_neg,
          CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
            AS BIGINT) AS only_a,
          CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
            AS BIGINT) AS only_b
        FROM r WHERE a IS NOT NULL AND b IS NOT NULL),
      pe AS (
        SELECT *, (both_pos + only_a) * (both_pos + only_b) +
          (only_b + both_neg) * (only_a + both_neg) AS e
        FROM conf)
      SELECT n, both_pos, both_neg, only_a, only_b,
        CASE WHEN n * n - e > 0 THEN
          CAST(n * (both_pos + both_neg) - e AS DOUBLE) /
            CAST(n * n - e AS DOUBLE) END AS kappa
      FROM pe""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      graft.analytics.Evaluation.cohenKappa(d,
        col("n_chars") >= 300,
        size(split(trim(col("text")), "\\s+")) >= 50)
    },

    // Deterministic negative sampling for contrastive training:
    // customer→part purchases are the positives; each customer draws
    // up to 5 non-purchased parts from a 20-item md5-ranked pool,
    // ranked by the pair hash — replayed verbatim by the oracle
    // (md5 hex strings compare identically in both engines). The pool
    // is one global top-N then broadcast; candidates are |Q|·20 rows,
    // linear in customers.
    Q("q180_negative_sample", Some("""
      WITH pos AS (
        SELECT DISTINCT o.o_custkey AS query_id, l.l_partkey AS item_id
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey IS NOT NULL AND l.l_partkey IS NOT NULL
      ), pool AS (
        SELECT item_id FROM (
          SELECT DISTINCT p_partkey AS item_id FROM part
          WHERE p_partkey IS NOT NULL)
        ORDER BY md5(CAST(item_id AS VARCHAR)), item_id LIMIT 20
      ), q AS (SELECT DISTINCT query_id FROM pos),
      cand AS (
        SELECT q.query_id, pool.item_id FROM q CROSS JOIN pool
        WHERE NOT EXISTS (SELECT 1 FROM pos
          WHERE pos.query_id = q.query_id
            AND pos.item_id = pool.item_id)
      ), ranked AS (
        SELECT query_id, item_id, row_number() OVER (
          PARTITION BY query_id
          ORDER BY md5(CAST(query_id AS VARCHAR) || '|' ||
            CAST(item_id AS VARCHAR)), item_id) AS rk
        FROM cand)
      SELECT query_id, item_id, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""")) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      val pos = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .where(col("o_custkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("o_custkey").as("query_id"),
          col("l_partkey").as("item_id"))
        .distinct()
      graft.analytics.Sampling.negativeSample(pos, "query_id",
        "item_id", Tables.load(s, dir, "part"), "p_partkey",
        k = 5, poolFactor = 4)
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // 100 docs drawn with inclusion probability increasing in
    // n_chars, priorities from the portable hash so the draw is
    // reproducible. Global top-k, never a full sort.
    Q("q117_weighted_sample", Some(s"""
      WITH pri AS (
        SELECT doc_id, n_chars,
          round((ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
              1, 8) AS BIGINT) % ${Dedup.P} + 0.5) / ${Dedup.P}.0)
            / n_chars) * 1000000000000.0) / 1000000000000.0 AS priority
        FROM documents WHERE n_chars > 0)
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority
      FROM pri ORDER BY priority DESC, doc_id LIMIT 100""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").where(col("n_chars") > 0)
      d.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          graft.analytics.Sampling
            .weightedPriority(col("doc_id"), col("n_chars"))
            .as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(100)
    },

    // Snapshot diff / data reconciliation: two versions of lineitem
    // (an older and a newer as-of filter; the newer one also drops
    // small-quantity rows and rewrites l_linestatus for returned
    // lines) classified added/removed/changed/unchanged. Only
    // (key, md5 hash) is shuffled — never full rows. The oracle
    // replays the same projections and a full-outer hash compare.
    {
      def contentSql(status: String) = s"""md5(concat_ws('|',
          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
          CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR),
          l_returnflag, $status))"""
      Q("q125_snapshot_diff", Some(s"""
      WITH oldsnap AS (
        SELECT l_orderkey, l_linenumber, ${contentSql("l_linestatus")} AS h
        FROM lineitem WHERE l_shipdate < DATE '1996-01-01'),
      newsnap AS (
        SELECT l_orderkey, l_linenumber,
          ${contentSql(
            "CASE WHEN l_returnflag = 'R' THEN 'X' ELSE l_linestatus END")}
            AS h
        FROM lineitem
        WHERE l_shipdate < DATE '1997-01-01' AND l_quantity >= 3),
      j AS (
        SELECT COALESCE(o.l_orderkey, n.l_orderkey) AS l_orderkey,
          CASE WHEN o.h IS NULL THEN 'added'
               WHEN n.h IS NULL THEN 'removed'
               WHEN o.h <> n.h THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM oldsnap o FULL OUTER JOIN newsnap n
          ON o.l_orderkey = n.l_orderkey
            AND o.l_linenumber = n.l_linenumber)
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM j GROUP BY status ORDER BY status""")) { (s, dir) =>
        val li = Tables.load(s, dir, "lineitem")
        def content(status: org.apache.spark.sql.Column) = concat_ws("|",
          Q.dec(col("l_quantity")).cast("string"),
          Q.dec(col("l_extendedprice")).cast("string"),
          Q.dec(col("l_discount")).cast("string"),
          col("l_returnflag"), status)
        val oldSnap = li.where(col("l_shipdate") < "1996-01-01")
        val newSnap = li
          .where(col("l_shipdate") < "1997-01-01" &&
            col("l_quantity") >= 3)
        val keyed = graft.analytics.JoinOps.snapshotDiff(
          oldSnap.withColumn("__c", content(col("l_linestatus"))),
          newSnap.withColumn("__c", content(
            when(col("l_returnflag") === "R", "X")
              .otherwise(col("l_linestatus")))),
          Seq("l_orderkey", "l_linenumber"), col("__c"))
        keyed.groupBy("status")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            countDistinct(col("l_orderkey")).cast("long").as("n_orders"))
          .orderBy("status")
      }
    }
  )
}
