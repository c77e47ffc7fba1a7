package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (north-star extension;
  * SURVEY §2.9).
  *
  * Scale posture: `bruteForceTopK` broadcasts the (small) query set and
  * streams the corpus once — O(|corpus|·|queries|) FLOPs but no shuffle
  * of the corpus and no O(n²) pair materialization. The LSH-bucketed
  * variant (`bucketedTopK`) prunes candidates to same-bucket rows, the
  * standard recall/throughput trade at 100 TB; buckets are sign-bit
  * projections so the bucketing is a pure expression (no model state).
  *
  * All arithmetic is a left-assoc double fold, bit-identical to the
  * DuckDB oracle's `list_reduce`.
  */
object Similarity {

  /** Left-fold sum of an array<double> column. */
  private def asum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity between two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = asum(zip_with(ad, bd, (x, y) => x * y))
    val na = asum(zip_with(ad, ad, (x, y) => x * y))
    val nb = asum(zip_with(bd, bd, (x, y) => x * y))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Sign-bit LSH bucket id from the first `bits` dimensions
    * (axis-aligned hyperplanes). Deterministic, SQL-expressible.
    */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each query vector (excluding self).
    * `queries` must be small (it is broadcast).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** IVF (inverted-file) approximate top-k. The codebook is the first
    * `codebookSize` corpus vectors (deterministic; swap in k-means
    * centroids without changing the shape). Every corpus vector is
    * assigned to its nearest centroid cell via a broadcast join against
    * the (tiny) codebook; queries probe their `nprobe` nearest cells;
    * exact cosine runs only on same-cell candidates. All joins are
    * equi-joins on cell id — candidate count ≈ |corpus|·nprobe/|cells|.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      codebookSize: Int, nprobe: Int): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < codebookSize)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("cent_emb"))
    def assign(df: DataFrame, idCol: String, embCol: String,
        probes: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("__cscore").desc, col("centroid_id"))
      df.crossJoin(broadcast(centroids))
        .withColumn("__cscore", cosine(col(embCol), col("cent_emb")))
        .withColumn("__crn", row_number().over(w))
        .filter(col("__crn") <= probes)
        .select(col(idCol), col(embCol),
          col("centroid_id").as("cell"))
    }
    val corpusCells = assign(corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb")),
      "neighbor_id", "c_emb", 1)
    val queryCells = assign(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "query_id", "q_emb", nprobe)
    val scored = corpusCells.join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score", "rn")
  }

  /** Approximate top-k: candidates restricted to the query's sign
    * bucket. At scale this replaces the all-pairs scan with a
    * bucket-equi-join (shuffle keyed on bucket id).
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      signBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "bucket", "neighbor_id", "score", "rn")
  }
}
