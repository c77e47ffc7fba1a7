package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Relevance

/** TF-IDF / BM25 relevance queries over `documents`. Scores contain
  * `ln`, which is not bit-portable across libm implementations (Java
  * vs C differ in the last ulp on ~0.1% of inputs), so the oracle
  * contract rounds scores to 4 decimals — `bround(x,4)` and DuckDB
  * `round_even(x,4)` were verified bit-identical over 200k
  * ln-distributed samples — and ranks on the ROUNDED score (+ id
  * tiebreak), making rank deterministic in both engines too.
  */
object RelevanceQueries {

  private val tokSql =
    "unnest(string_split_regex(trim(lower(text)), '\\s+'))"

  /** Shared DuckDB CTEs: term freqs, doc freqs, corpus size. */
  private val baseCtes = s"""
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM (
          SELECT doc_id, $tokSql AS term FROM documents) tk
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n FROM documents)"""

  val all: Seq[Q] = Seq(

    // Smooth TF-IDF (sklearn convention): top-10 terms per document
    // for the first 20 docs, ranked by rounded weight.
    Q("q59_tfidf", Some(s"""
      WITH $baseCtes,
      w AS (
        SELECT t.doc_id, t.term,
          round_even(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), 4)
            AS tfidf4
        FROM tf t JOIN dfreq d ON t.term = d.term CROSS JOIN n
        WHERE t.doc_id < 20)
      SELECT doc_id, term, tfidf4, CAST(rn AS INT) AS rn FROM (
        SELECT doc_id, term, tfidf4,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf4 DESC, term) AS rn
        FROM w) t
      WHERE rn <= 10 ORDER BY doc_id, rn""")) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf4").desc, col("term"))
      Relevance.tfidf(docs, "doc_id", "text")
        .filter(col("doc_id") < 20)
        .withColumn("tfidf4", bround(col("tfidf"), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("term"), col("tfidf4"),
          col("rn").cast("int").as("rn"))
        .orderBy("doc_id", "rn")
    },

    // Hybrid retrieval via reciprocal-rank fusion: lexical BM25
    // top-20 + dense cosine top-20 per query, fused by
    // rrf = 1/(60+rank_lex) + 1/(60+rank_dense). Only RANKS cross
    // the fusion boundary (no score-scale normalization, and the
    // lexical rank is taken on the ROUNDED BM25 score per this
    // file's ln-portability contract).
    Q("q141_rrf_fusion", Some(s"""
      WITH $baseCtes,
      q(query_id, text) AS (VALUES
        (1, 'hash join filter'),
        (2, 'stream window batch'),
        (3, 'vector scan merge')),
      qt AS (SELECT DISTINCT query_id, $tokSql AS term FROM q),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
      stats AS (
        SELECT (SELECT SUM(tf) FROM tf)::DOUBLE / (SELECT n FROM n)
          AS avgdl),
      parts AS (
        SELECT qt.query_id, t.doc_id, t.term,
          ln(1.0 + ((SELECT n FROM n) - d.df + 0.5) / (d.df + 0.5))
            * (t.tf * (1.2 + 1)) /
            (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl /
              (SELECT avgdl FROM stats))) AS part
        FROM qt JOIN tf t USING (term)
        JOIN dfreq d ON t.term = d.term
        JOIN dl ON t.doc_id = dl.doc_id),
      bscored AS (
        SELECT query_id, doc_id,
          round_even(list_reduce(
            list_prepend(0.0, list(part ORDER BY term)),
            (acc, v) -> acc + v), 4) AS s4
        FROM parts GROUP BY query_id, doc_id),
      lex AS (
        SELECT query_id, doc_id, rn FROM (
          SELECT query_id, doc_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY s4 DESC, doc_id) AS rn
          FROM bscored) t
        WHERE rn <= 20),
      dscored AS (
        SELECT CAST(dq.vec_id AS INT) AS query_id,
          c.vec_id AS doc_id,
          ${SimilarityQueries.duckCosine(
            "dq.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")}
            AS score
        FROM embeddings dq JOIN embeddings c
          ON dq.vec_id <> c.vec_id
        WHERE dq.vec_id IN (1, 2, 3)),
      dense AS (
        SELECT query_id, doc_id, rn FROM (
          SELECT query_id, doc_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS rn
          FROM dscored) t
        WHERE rn <= 20),
      fused AS (
        SELECT coalesce(l.query_id, d.query_id) AS query_id,
          coalesce(l.doc_id, d.doc_id) AS doc_id,
          coalesce(CAST(1.0 AS DOUBLE)
              / (CAST(60.0 AS DOUBLE) + l.rn), CAST(0.0 AS DOUBLE))
          + coalesce(CAST(1.0 AS DOUBLE)
              / (CAST(60.0 AS DOUBLE) + d.rn), CAST(0.0 AS DOUBLE))
            AS rrf
        FROM lex l FULL OUTER JOIN dense d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
      SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id, rrf,
        CAST(rn AS INT) AS rn
      FROM (
        SELECT query_id, doc_id, rrf,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, doc_id) AS rn
        FROM fused) t
      WHERE rn <= 10 ORDER BY query_id, rn""")) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val queries = Seq(
        (1, "hash join filter"),
        (2, "stream window batch"),
        (3, "vector scan merge")).toDF("query_id", "text")
      val wLex = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("s4").desc, col("doc_id"))
      val lex = Relevance.bm25Scores(docs, "doc_id", "text", queries)
        .withColumn("s4", bround(col("score"), 4))
        .withColumn("rn", row_number().over(wLex))
        .filter(col("rn") <= 20)
        .select("query_id", "doc_id", "rn")
      val dense = graft.analytics.Similarity.bruteForceTopK(
          emb.filter(col("vec_id").isin(1, 2, 3)), emb, k = 20)
        .select(col("query_id").cast("int").as("query_id"),
          col("neighbor_id").as("doc_id"), col("rn"))
      Relevance.rrfFuse(lex, dense, k = 60, topK = 10)
        .orderBy("query_id", "rn")
    },

    // BM25 ranked retrieval (k1=1.2, b=0.75): three literal queries
    // against the inverted index; per-(query, doc) score is a
    // term-sorted left fold in BOTH engines (float addition is not
    // associative — an unordered SUM could never hash-match).
    Q("q60_bm25", Some(s"""
      WITH $baseCtes,
      q(query_id, text) AS (VALUES
        (1, 'hash join filter'),
        (2, 'stream window batch'),
        (3, 'vector scan merge')),
      qt AS (SELECT DISTINCT query_id, $tokSql AS term FROM q),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
      stats AS (
        SELECT (SELECT SUM(tf) FROM tf)::DOUBLE / (SELECT n FROM n)
          AS avgdl),
      parts AS (
        SELECT qt.query_id, t.doc_id, t.term,
          ln(1.0 + ((SELECT n FROM n) - d.df + 0.5) / (d.df + 0.5))
            * (t.tf * (1.2 + 1)) /
            (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl /
              (SELECT avgdl FROM stats))) AS part
        FROM qt JOIN tf t USING (term)
        JOIN dfreq d ON t.term = d.term
        JOIN dl ON t.doc_id = dl.doc_id),
      scored AS (
        SELECT query_id, doc_id,
          round_even(list_reduce(
            list_prepend(0.0, list(part ORDER BY term)),
            (acc, v) -> acc + v), 4) AS s4
        FROM parts GROUP BY query_id, doc_id)
      SELECT query_id, doc_id, s4, CAST(rn AS INT) AS rn FROM (
        SELECT query_id, doc_id, s4,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY s4 DESC, doc_id) AS rn
        FROM scored) t
      WHERE rn <= 5 ORDER BY query_id, rn""")) { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val queries = Seq(
        (1, "hash join filter"),
        (2, "stream window batch"),
        (3, "vector scan merge")).toDF("query_id", "text")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("s4").desc, col("doc_id"))
      Relevance.bm25Scores(docs, "doc_id", "text", queries)
        .withColumn("s4", bround(col("score"), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("doc_id"), col("s4"),
          col("rn").cast("int").as("rn"))
        .orderBy("query_id", "rn")
    },

    // Inverted-index materialization: per-term document frequency,
    // corpus term frequency, and a BOUNDED posting-list head (first
    // 10 doc_ids, ascending, comma-joined so the hash compare sees a
    // plain string). The head is cut by a term-partitioned rank —
    // never a per-term collect of the full posting list — so the
    // shape at 100 TB is the (doc_id, term) keyed shuffle that
    // TF-IDF/BM25 already pay, one vocabulary-sized aggregate, and a
    // vocabulary-sized join; no row ever carries more than 10 ids.
    Q("q163_inverted_index", Some(s"""
      WITH $baseCtes,
      r AS (
        SELECT term, doc_id,
          ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id)
            AS rn
        FROM tf),
      heads AS (
        SELECT term,
          string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
            AS postings_head
        FROM r WHERE rn <= 10 GROUP BY term),
      stats AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
          CAST(SUM(tf) AS BIGINT) AS ctf
        FROM tf GROUP BY term)
      SELECT s.term, s.df, s.ctf, h.postings_head
      FROM stats s JOIN heads h ON s.term = h.term
      ORDER BY s.df DESC, s.term LIMIT 50""")) { (s, dir) =>
      val tf = Relevance.termFreqs(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("term").orderBy("doc_id")
      val heads = tf
        .withColumn("rn", row_number().over(wr))
        .where(col("rn") <= 10)
        .groupBy("term")
        .agg(array_join(array_sort(collect_list(col("doc_id"))), ",")
          .as("postings_head"))
      val stats = tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
      stats.join(heads, "term")
        .orderBy(desc("df"), asc("term"))
        .limit(50)
        .select("term", "df", "ctf", "postings_head")
    }
  )
}
