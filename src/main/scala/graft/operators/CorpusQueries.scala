package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.CorpusOps

/** Corpus-preparation queries over `documents`: PII redaction,
  * eval-set decontamination, repetition signals, token chunking
  * ([[graft.analytics.CorpusOps]]). The corpus texts are synthetic
  * word salad with no embedded PII, so q67 derives deterministic
  * PII spans from `doc_id` (same construction in Spark and the
  * oracle) to prove the detect/redact path end to end on real data
  * volume.
  */
object CorpusQueries {

  val all: Seq[Q] = Seq(

    // PII detect + redact. The enriched text is bound once behind a
    // generator barrier: the three counters and the redaction chain
    // each reference it, and regex evaluation is the dominant cost.
    Q("q67_pii_scrub", Some("""
      WITH enr AS (
        SELECT doc_id, concat(text, ' Contact user', doc_id,
          '@example.org or +1-555-',
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' from 10.',
          CAST(doc_id % 256 AS VARCHAR), '.',
          CAST((doc_id * 3 + 7) % 256 AS VARCHAR), '.',
          CAST(doc_id % 250 + 1 AS VARCHAR), '.') AS txt
        FROM documents WHERE text IS NOT NULL
      )
      SELECT doc_id,
        CAST(len(regexp_extract_all(txt,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
          AS n_emails,
        CAST(len(regexp_extract_all(txt,
          '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(txt,
          '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        md5(regexp_replace(regexp_replace(regexp_replace(txt,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          '<EMAIL>', 'g'),
          '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
          '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'))
          AS redacted_hash
      FROM enr ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val id = col("doc_id")
      val enriched = concat(col("text"), lit(" Contact user"),
        id.cast("string"), lit("@example.org or +1-555-"),
        lpad((id % 10000).cast("string"), 4, "0"), lit(" from 10."),
        (id % 256).cast("string"), lit("."),
        ((id * 3 + 7) % 256).cast("string"), lit("."),
        (id % 250 + 1).cast("string"), lit("."))
      d.where(col("text").isNotNull)
        .select(id, explode(array(enriched)).as("txt"))
        .select(id,
          CorpusOps.piiCount(col("txt"), CorpusOps.EmailRe).as("n_emails"),
          CorpusOps.piiCount(col("txt"), CorpusOps.PhoneRe).as("n_phones"),
          CorpusOps.piiCount(col("txt"), CorpusOps.Ipv4Re).as("n_ips"),
          md5(CorpusOps.redactPii(col("txt"))).as("redacted_hash"))
        .orderBy("doc_id")
    },

    // Eval-set decontamination: src0 docs stand in for a benchmark
    // suite; every other doc reports its 5-gram overlap fraction.
    Q("q68_decontaminate", Some("""
      WITH tok AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ), sh AS (
        SELECT doc_id, source,
          unnest(list_distinct(CASE WHEN len(t) >= 5
            THEN list_transform(generate_series(1, len(t) - 4),
                 i -> array_to_string(t[i:i+4], ' '))
            ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM tok
      ), bench AS (
        SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
      ), corp AS (
        SELECT doc_id, shingle FROM sh WHERE source <> 'src0'
      )
      SELECT c.doc_id,
        CAST(count(*) AS BIGINT) AS n_shingles,
        CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_contaminated,
        CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
      FROM corp c LEFT JOIN bench b USING (shingle)
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      CorpusOps.contamination(
          d.where(col("source") =!= "src0"),
          d.where(col("source") === "src0"),
          "doc_id", "text", n = 5)
        .orderBy("doc_id")
    },

    // Repetition quality signals (duplicate n-gram fractions).
    Q("q69_repetition", Some("""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      )
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_tokens,
        CASE WHEN len(t) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                  / CAST(len(t) AS DOUBLE) END AS dup_unigram_frac,
        CASE WHEN greatest(len(t) - 1, 0) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(t) - 1),
                    i -> array_to_string(t[i:i+1], ' ')))) AS DOUBLE)
                  / CAST(len(t) - 1 AS DOUBLE) END AS dup_bigram_frac,
        CASE WHEN greatest(len(t) - 2, 0) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(t) - 2),
                    i -> array_to_string(t[i:i+2], ' ')))) AS DOUBLE)
                  / CAST(len(t) - 2 AS DOUBLE) END AS dup_trigram_frac
      FROM tok ORDER BY doc_id""")) { (s, dir) =>
      CorpusOps.repetitionSignals(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Overlapping token chunking (window 32, stride 24).
    Q("q70_chunks", Some("""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ), st AS (
        SELECT doc_id, t,
          unnest(generate_series(1, len(t), 24)) AS start
        FROM tok
      )
      SELECT doc_id,
        CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
        CAST(least(32, len(t) - start + 1) AS BIGINT) AS n_chunk_tokens,
        md5(array_to_string(t[start:start+31], ' ')) AS chunk_hash
      FROM st ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      CorpusOps.chunk(Tables.load(s, dir, "documents"),
          "doc_id", "text", window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing: non-overlapping 32-token chunks laid end to
    // end per shard (doc_id % 16), split into ~512-token training
    // sequences at the running-sum boundary.
    Q("q72_pack_sequences", Some("""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ), ch AS (
        SELECT doc_id,
          CAST((start - 1) // 32 AS BIGINT) AS chunk_idx,
          CAST(least(32, len(t) - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM (SELECT doc_id, t,
                unnest(generate_series(1, len(t), 32)) AS start
              FROM tok)
      ), cum AS (
        SELECT doc_id, chunk_idx, n_chunk_tokens, doc_id % 16 AS shard,
          COALESCE(SUM(n_chunk_tokens) OVER (
            PARTITION BY doc_id % 16 ORDER BY doc_id, chunk_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_excl
        FROM ch
      )
      SELECT CAST(shard AS BIGINT) AS shard,
        CAST(floor(cum_excl / 512) AS BIGINT) AS seq_id,
        CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM cum GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val chunks = CorpusOps.chunk(Tables.load(s, dir, "documents"),
        "doc_id", "text", window = 32, stride = 32)
      CorpusOps.packSequences(chunks, budget = 512, shards = 16)
        .select(col("shard").cast("long").as("shard"), col("seq_id"),
          col("n_chunks"), col("n_tokens"), col("n_docs"))
        .orderBy("shard", "seq_id")
    },

    // Packing-efficiency audit over the q72 chain: per shard, how
    // well do the packed sequences fill the 512-token context —
    // n_seqs, total/min/max sequence tokens, and utilization (exact
    // integer sums, one double division against n_seqs·512). The
    // pre-padding waste report a training-data run reads before
    // committing a context length.
    Q("q248_packing_efficiency", Some("""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ), ch AS (
        SELECT doc_id,
          CAST((start - 1) // 32 AS BIGINT) AS chunk_idx,
          CAST(least(32, len(t) - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM (SELECT doc_id, t,
                unnest(generate_series(1, len(t), 32)) AS start
              FROM tok)
      ), cum AS (
        SELECT doc_id, chunk_idx, n_chunk_tokens, doc_id % 16 AS shard,
          COALESCE(SUM(n_chunk_tokens) OVER (
            PARTITION BY doc_id % 16 ORDER BY doc_id, chunk_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_excl
        FROM ch
      ), seqs AS (
        SELECT CAST(shard AS BIGINT) AS shard,
          CAST(floor(cum_excl / 512) AS BIGINT) AS seq_id,
          CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens
        FROM cum GROUP BY 1, 2)
      SELECT shard, CAST(count(*) AS BIGINT) AS n_seqs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST(MIN(n_tokens) AS BIGINT) AS min_seq_tokens,
        CAST(MAX(n_tokens) AS BIGINT) AS max_seq_tokens,
        CAST(SUM(n_tokens) AS DOUBLE)
          / (CAST(count(*) AS DOUBLE) * 512.0) AS utilization
      FROM seqs GROUP BY shard ORDER BY shard""")) { (s, dir) =>
      val chunks = CorpusOps.chunk(Tables.load(s, dir, "documents"),
        "doc_id", "text", window = 32, stride = 32)
      CorpusOps.packSequences(chunks, budget = 512, shards = 16)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("n_tokens")).as("min_seq_tokens"),
          max(col("n_tokens")).as("max_seq_tokens"),
          (sum(col("n_tokens")).cast("double") /
            (count(lit(1)).cast("double") * lit(512.0)))
            .as("utilization"))
        .orderBy("shard")
    },

    // URL curation: host/TLD facets + blocklist gate over synthetic
    // source URLs (the corpus carries none; doc_id-derived URLs — a
    // sliver malformed on purpose — exercise the real parse path).
    Q("q73_url_curation", Some("""
      WITH urls AS (
        SELECT doc_id,
          CASE WHEN doc_id % 13 = 0 THEN 'not a url'
               ELSE concat('https://', source,
                 CASE WHEN doc_id % 7 = 0 THEN '.biz' ELSE '.org' END,
                 '/doc/', doc_id) END AS url
        FROM documents
      ), facets AS (
        SELECT doc_id,
          NULLIF(regexp_extract(url, '^[a-z]+://([^/:]+)', 1), '')
            AS host,
          NULLIF(regexp_extract(NULLIF(regexp_extract(url,
            '^[a-z]+://([^/:]+)', 1), ''), '([^.]+)$', 1), '') AS tld
        FROM urls
      )
      SELECT tld, (host IS NULL OR lower(tld) IN ('biz')) AS blocked,
        CAST(count(*) AS BIGINT) AS n_urls,
        CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
      FROM facets GROUP BY 1, 2
      ORDER BY tld NULLS FIRST, blocked""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val url = when(col("doc_id") % 13 === 0, lit("not a url"))
        .otherwise(concat(lit("https://"), col("source"),
          when(col("doc_id") % 7 === 0, lit(".biz")).otherwise(lit(".org")),
          lit("/doc/"), col("doc_id").cast("string")))
      d.select(CorpusOps.urlFacets(url, blockedTlds = Seq("biz")): _*)
        .groupBy("tld", "blocked")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("host")).as("n_hosts"))
        .orderBy(col("tld").asc_nulls_first, col("blocked"))
    },

    // The composed corpus-prep pipeline — the decision a training-data
    // run makes per document, as ONE declarative plan: language-ID +
    // quality gates + exact-dup keep-first + eval-set decontamination,
    // folded into a kept/dropped verdict. Language, quality, and dup
    // rank come from a single corpus scan (one generator barrier + one
    // window); contamination joins in from the shingle pass. Oracle
    // composes the same pieces the standalone queries (q25/q26/q08/
    // q68) verify individually.
    {
      val keepLang = "en"; val minQuality = 0.75; val maxContam = 0.5
      Q("q79_corpus_prep", Some(s"""
      WITH tok AS (
        SELECT doc_id, source, text,
          string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL),
      corpus AS (SELECT * FROM tok WHERE source <> 'src0'),
      lang AS (
        SELECT doc_id, ${TextQueries.duckLangCase} AS predicted FROM (
          SELECT doc_id,
            ${TextQueries.duckLangScores}
          FROM corpus)),
      qual AS (
        SELECT doc_id,
          (CAST(n_tokens BETWEEN 20 AND 100000 AS INT)
           + CAST(mean_token_len BETWEEN 3.0 AND 10.0 AS INT)
           + CAST(stop_ratio >= 0.01 AS INT)
           + CAST(punct_ratio <= 0.1 AS INT))::DOUBLE / 4 AS quality_score
        FROM (
          SELECT doc_id, len(t) AS n_tokens,
            length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE / len(t)::DOUBLE AS mean_token_len,
            len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for')))::DOUBLE / len(t)::DOUBLE AS stop_ratio,
            length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio
          FROM corpus)),
      dup AS (
        SELECT doc_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY md5(text)
            ORDER BY doc_id) > 1 AS INT) AS is_dup
        FROM corpus),
      sh AS (
        SELECT doc_id, source,
          unnest(list_distinct(CASE WHEN len(t) >= 5
            THEN list_transform(generate_series(1, len(t) - 4),
                 i -> array_to_string(t[i:i+4], ' '))
            ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM tok),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
      cont AS (
        SELECT c.doc_id,
          CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
        FROM (SELECT doc_id, shingle FROM sh WHERE source <> 'src0') c
        LEFT JOIN bench b USING (shingle)
        GROUP BY 1)
      SELECT c.doc_id, l.predicted, q.quality_score, d.is_dup,
        COALESCE(ct.contamination, 0.0) AS contamination,
        CAST(l.predicted = '$keepLang' AND q.quality_score >= $minQuality
          AND d.is_dup = 0 AND COALESCE(ct.contamination, 0.0) < $maxContam
          AS INT) AS kept
      FROM (SELECT doc_id FROM corpus) c
      JOIN lang l USING (doc_id)
      JOIN qual q USING (doc_id)
      JOIN dup d USING (doc_id)
      LEFT JOIN cont ct USING (doc_id)
      ORDER BY doc_id""")) { (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        import graft.analytics.{TextAnalysis => TA}
        val d = Tables.load(s, dir, "documents")
          .where(col("text").isNotNull)
        val corpus = d.where(col("source") =!= "src0")
        CorpusOps.prepVerdict(corpus,
            d.where(col("source") === "src0"), "doc_id", "text",
            keepLang, minQuality, maxContam)
          .orderBy("doc_id")
      }
    },

    // Chunk-level decontamination — the span-removal variant of q68:
    // a 32-token chunk is dropped iff it contains ANY benchmark
    // (src0) 5-gram; the doc keeps its clean chunks (what production
    // decontamination ships — cut the quoted passage, keep the doc).
    // One shingle equi-join + two hash aggregations; the oracle
    // replays chunking, in-chunk shingles, and the any-hit verdict.
    Q("q243_decontaminate_chunks", Some("""
      WITH tok AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL),
      bench AS (
        SELECT DISTINCT unnest(list_distinct(CASE WHEN len(t) >= 5
          THEN list_transform(generate_series(1, len(t) - 4),
               i -> array_to_string(t[i:i+4], ' '))
          ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM tok WHERE source = 'src0'),
      ch AS (
        SELECT doc_id, CAST((start - 1) // 32 AS BIGINT) AS chunk_idx,
          t[start:start+31] AS ctoks
        FROM (SELECT doc_id, t,
                unnest(generate_series(1, greatest(len(t), 1), 32))
                  AS start
              FROM tok WHERE source <> 'src0')),
      chs AS (
        SELECT doc_id, chunk_idx,
          CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
          unnest(list_concat(CAST([NULL] AS VARCHAR[]),
            CASE WHEN len(ctoks) >= 5
              THEN list_transform(generate_series(1, len(ctoks) - 4),
                   i -> array_to_string(ctoks[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END)) AS shingle
        FROM ch),
      v AS (
        SELECT doc_id, chunk_idx, MIN(n_chunk_tokens) AS n_chunk_tokens,
          MAX(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS dropped
        FROM chs LEFT JOIN bench b USING (shingle)
        GROUP BY 1, 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(SUM(1 - dropped) AS BIGINT) AS n_kept,
        CAST(SUM(dropped) AS BIGINT) AS n_dropped,
        CAST(SUM(CASE WHEN dropped = 0 THEN n_chunk_tokens ELSE 0 END)
          AS BIGINT) AS kept_tokens
      FROM v GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      CorpusOps.decontaminateChunks(
          d.where(col("source") =!= "src0"),
          d.where(col("source") === "src0"),
          "doc_id", "text", window = 32, n = 5)
        .orderBy("doc_id")
    },

    // Corpus-wide exact paragraph dedup (C4/Dolma pass): later
    // occurrences of a repeated paragraph are dropped, documents are
    // reassembled from survivors. Paragraph = non-overlapping 3-token
    // run (the synthetic corpus is single-line; the small vocabulary
    // makes 3-token runs collide at a realistic boilerplate rate,
    // ~19% of chunks removed at sf0.01). One shuffle keyed on
    // paragraph content decides survivorship; one shuffle on doc_id
    // reassembles — both plain hash exchanges at 100 TB.
    {
      val K = 3
      Q("q104_paragraph_dedup", Some(s"""
      WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE text IS NOT NULL),
      chunks AS (
        SELECT doc_id, pos,
          array_to_string(w[(pos*$K+1):(pos*$K+$K)], ' ') AS para
        FROM (SELECT doc_id, w,
                unnest(range(0, CAST(ceil(len(w) / $K.0) AS BIGINT))) AS pos
              FROM words)),
      flag AS (
        SELECT doc_id, pos, para,
          (ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1)
            AS kept
        FROM chunks)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
        CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        COALESCE(string_agg(CASE WHEN kept THEN para END, ' '
          ORDER BY pos), '') AS dedup_text
      FROM flag GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
        CorpusOps.paragraphDedup(
            Tables.load(s, dir, "documents"), "doc_id", "text", k = K)
          .orderBy("doc_id")
      }
    },

    // Exact substring dedup (Lee et al. 2022 ExactSubstr): stride-1
    // k-token windows, corpus-first occurrence survives, non-first
    // occurrences merged into per-doc duplicated spans. The Spark
    // plan is two keyed shuffles (window-hash, then doc_id) — the
    // suffix-array-free formulation that stays linear in total token
    // count at 100 TB. k=8 flags ~4.6% of windows on this corpus.
    {
      val K = 8
      Q("q111_substring_dedup", Some(s"""
      WITH words AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE text IS NOT NULL),
      sized AS (
        SELECT doc_id, w, len(w) AS n FROM words WHERE len(w) >= $K),
      win AS (
        SELECT doc_id, pos,
          md5(array_to_string(w[(pos+1):(pos+$K)], ' ')) AS h
        FROM (SELECT doc_id, w, n,
                unnest(range(0, n - $K + 1)) AS pos FROM sized)),
      dups AS (
        SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
            ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          FROM win) WHERE rn > 1),
      spans AS (
        SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                 <= $K THEN 0 ELSE 1 END AS new_span
        FROM dups),
      sp2 AS (
        SELECT doc_id, pos,
          SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM spans),
      per_doc AS (
        SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(nw) AS n_dup_windows,
          SUM(cov) AS dup_tokens
        FROM (SELECT doc_id, span_id, COUNT(*) AS nw,
                MAX(pos) - MIN(pos) + $K AS cov
              FROM sp2 GROUP BY 1, 2) GROUP BY 1)
      SELECT s.doc_id, CAST(s.n - ($K - 1) AS BIGINT) AS n_windows,
        CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
        CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
      FROM sized s LEFT JOIN per_doc p USING (doc_id)
      ORDER BY doc_id""")) { (s, dir) =>
        CorpusOps.substringDedup(
            Tables.load(s, dir, "documents"), "doc_id", "text", k = K)
          .orderBy("doc_id")
      }
    }
  )
}
