package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance operators (north-star text tier): TF-IDF term
  * weighting and BM25 ranked retrieval — the quality-filtering /
  * retrieval primitives of a training-data pipeline.
  *
  * Scale shape: everything is inverted-index algebra — explode to
  * (doc, term), aggregate, equi-join on term, aggregate on
  * (query, doc). No all-pairs products, no driver-side loops; the only
  * driver scalar is the corpus document count (one number).
  *
  * Determinism: BM25's per-(query, doc) sum over matched terms is a
  * term-sorted left fold, not a float `sum()` — double addition is not
  * associative, so an unordered aggregate would vary with partitioning
  * (and can never hash-match an oracle). `ln` itself is NOT
  * bit-portable across libm implementations (Java vs C differ in the
  * last ulp on ~0.1% of inputs), so oracle comparisons round scores to
  * a tolerance; the operators expose the exact doubles.
  */
object Relevance {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** (doc_id, term, tf): term occurrence counts per document. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Adds `df` (number of documents containing the term) to a
    * [[termFreqs]] frame. Aggregate-then-join, NOT a count window:
    * the window form exchanges AND sorts the whole data-sized frame by
    * term, while the aggregate reuses the (doc_id, term) shuffle
    * already materialized for [[termFreqs]] (identical-exchange
    * reuse), condenses map-side to vocabulary size, and joins back as
    * a runtime broadcast — the posting list itself is never
    * re-shuffled. */
  def withDocFreq(termFreqs: DataFrame): DataFrame =
    termFreqs.join(
      termFreqs.groupBy("term").agg(count(lit(1)).as("df")),
      Seq("term"))

  /** Smooth idf (sklearn convention): ln((N+1)/(df+1)) + 1. */
  def smoothIdf(df: Column, nDocs: Long): Column =
    log((lit(nDocs) + 1.0) / (df + 1.0)) + 1.0

  /** BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)). */
  def bm25Idf(df: Column, nDocs: Long): Column =
    log(lit(1.0) + (lit(nDocs) - df + 0.5) / (df + 0.5))

  /** (doc_id, term, tf, df, tfidf): per-document term weights.
    * One tokenize pass: both [[withDocFreq]] branches hang off the
    * same (doc_id, term) aggregation, so identical-exchange reuse runs
    * the explode+shuffle once and the df side joins back as a
    * vocabulary-sized broadcast.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    withDocFreq(termFreqs(docs, idCol, textCol))
      .withColumn("tfidf", col("tf") * smoothIdf(col("df"), n))
      .select("doc_id", "term", "tf", "df", "tfidf")
  }

  /** BM25 scores for every (query, candidate document) pair sharing at
    * least one term. `queries` is (query_id, text); matching is an
    * equi-join of distinct query terms against the (term → doc)
    * inverted index, so only documents sharing a term with the query
    * are ever scored. The per-(query, doc) score is a term-sorted left
    * fold (see class doc).
    *
    * Job shape: ONE scalar pre-pass (corpus count + total tokens in a
    * single aggregation over `docs` — avgdl needs them as literals)
    * and one declarative plan for everything else. The term-frequency
    * aggregation feeds both the query-term postings and the
    * doc-length sums, but both branches are the identical
    * (doc_id, term) exchange, so Spark's identical-exchange reuse
    * runs the tokenize+shuffle once — no persist, no checkpoint, no
    * extra actions (at sf0.1 the query is job-latency-bound: the
    * previous persist + two scalar jobs + checkpoint cost more wall
    * time than every shuffle combined).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // total corpus tokens is an exact long sum → avgdl is one
    // deterministic double division; size(split) counts exactly what
    // the termFreqs explode emits
    val stats = docs.agg(count(lit(1)).as("n"),
      coalesce(sum(size(tokens(col(textCol))).cast("long")), lit(0L))
        .as("tok")).collect()(0)
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.max(1L)
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val qterms = queries.select(col("query_id"),
        explode(tokens(col("text"))).as("term"))
      .distinct()
    // only postings of query terms are ever scored, so restrict the
    // index FIRST (broadcast semi-join on the handful of query terms)
    // and compute document frequency over that slice — df of a term
    // counts the same documents either way, but the full-vocabulary
    // df (and the data-sized shuffle it costs) is never needed
    val tfq = tf.join(broadcast(qterms.select("term").distinct()),
      Seq("term"), "leftsemi")
    val dfq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val parts = qterms.join(tfq, Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("part",
        bm25Idf(col("df"), n) * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl)))
    parts.groupBy("query_id", "doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("part")))),
        lit(0.0),
        (acc, x) => acc + x.getField("part")).as("score"))
  }

  /** BM25 ranked retrieval: top-`k` documents per query, near-ties
    * broken by doc_id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scores(docs, idCol, textCol, queries, k1, b)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "doc_id", "score", "rn")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    * of two ranked runs — the standard hybrid-retrieval combiner
    * (lexical BM25 + dense ANN): documents are rescored by
    *
    *   rrf = Σ_runs 1 / (k + rank)
    *
    * over the runs that retrieved them (absent run ⇒ 0 contribution).
    * Only RANKS cross the fusion boundary, so incomparable score
    * scales (BM25 vs cosine) need no normalization — and the double
    * arithmetic is two divisions and one add per row in fixed order,
    * hash-reproducible.
    *
    * Inputs carry (query_id, doc_id, rn); runs are top-N per query
    * (bounded), so the full-outer join and per-query re-rank touch
    * ≤ 2N rows per query regardless of corpus size.
    */
  def rrfFuse(runA: DataFrame, runB: DataFrame, k: Int = 60,
      topK: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val a = runA.select(col("query_id"), col("doc_id"),
      col("rn").as("rn_a"))
    val b = runB.select(col("query_id"), col("doc_id"),
      col("rn").as("rn_b"))
    val fused = a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(k.toDouble) + col("rn_a")), lit(0.0))
          + coalesce(lit(1.0) / (lit(k.toDouble) + col("rn_b")),
            lit(0.0))).as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("query_id", "doc_id", "rrf", "rn")
  }
}
