package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering, the way the GPT-3 / CCNet
  * pipelines gate web corpora: a logistic-regression model over cheap
  * per-document features, trained distributed with full-batch gradient
  * descent, then applied corpus-wide as a map-only scoring pass.
  *
  * The training loop is the textbook shape for Spark: per iteration
  * ONE aggregation job reduces the corpus to d+1 gradient sums (the
  * only driver state is the weight vector), so the pass over 100 TB is
  * embarrassingly parallel and the iteration count — not the data
  * size — bounds the serial work.
  *
  * Determinism contract (the driver hash-compares against a DuckDB
  * replay of the same math): every transcendental output (ln, exp) is
  * quantized — features to 1e-6, sigmoids to 1e-4 — so a ≤1-ulp libm
  * difference between engines cannot change a value; per-row gradient
  * terms are then scaled by 1e8 and rounded to BIGINT so the gradient
  * SUM is exact integer arithmetic, independent of partitioning and
  * summation order. Weight updates are scalar IEEE ops on identical
  * inputs — identical in both engines. See the q115 oracle for the
  * unrolled-SQL mirror.
  */
object QualityModel {

  /** Round `c` to 1/scale — positive inputs round identically in
    * Spark (HALF_UP) and DuckDB (half away from zero). */
  private def quant(c: Column, scale: Double): Column =
    round(c * scale) / scale

  /** Per-document features + label: x1 log token count, x2 distinct
    * ratio, x3 mean token length, x4 short-token fraction, plus the
    * caller's 0/1 `label`. One map-only pass; the token array is bound
    * once behind a generator barrier. */
  def features(docs: DataFrame, idCol: String, textCol: String,
      label: Column): DataFrame = {
    val bound = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(array(Dedup.tokens(col(textCol)))).as("__w"),
        label.cast("double").as("y"))
    val nTok = size(col("__w")).cast("double")
    bound.select(col("doc_id"),
      quant(log(lit(1.0) + nTok), 1e6).as("x1"),
      quant(size(array_distinct(col("__w"))).cast("double") / nTok, 1e6)
        .as("x2"),
      quant(aggregate(transform(col("__w"), t => length(t)), lit(0L),
        (a, x) => a + x).cast("double") / nTok, 1e6).as("x3"),
      quant(size(filter(col("__w"), t => length(t) <= 3)).cast("double")
        / nTok, 1e6).as("x4"),
      col("y"))
  }

  private def featureCols: Seq[Column] =
    Seq(lit(1.0), col("x1"), col("x2"), col("x3"), col("x4"))

  /** The quantized sigmoid of the linear predictor under weights `w`:
    * `round(1/(1+exp(-(w0 + w1·x1 + …))) · 1e4) / 1e4`. */
  def scoreCol(w: Array[Double]): Column = {
    val z = featureCols.zip(w).map { case (x, wi) => x * lit(wi) }
      .reduce(_ + _)
    quant(lit(1.0) / (lit(1.0) + exp(-z)), 1e4)
  }

  /** Full-batch gradient descent from zero weights: `iters` jobs, each
    * reducing the corpus to d+1 exact integer gradient sums. A frame
    * the CALLER already cached is left cached (so a following
    * [[score]] pass reuses it instead of re-tokenizing the corpus);
    * an uncached frame is cached for the iterations and unpersisted
    * after. Fails loudly on an empty frame — a NULL gradient sum
    * would otherwise surface as an opaque unboxing NPE. */
  def train(feat: DataFrame, iters: Int, lr: Double): Array[Double] = {
    var w = Array.fill(featureCols.length)(0.0)
    val callerCached =
      feat.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) feat else feat.cache()
    try {
      for (_ <- 0 until iters) {
        val t = scoreCol(w) - col("y")
        val aggs = featureCols.zipWithIndex.map { case (x, j) =>
          sum(round((t * x) * 1e8).cast("long")).as(s"s$j") }
        val row = cached
          .select(aggs :+ count(lit(1)).as("n"): _*).collect()(0)
        val n = row.getAs[Long]("n")
        require(n > 0L,
          "QualityModel.train: no training rows (every document was " +
            "filtered out) — nothing to fit")
        w = w.zipWithIndex.map { case (wi, j) =>
          wi - lr * ((row.getAs[Long](s"s$j") / 1e8) / n.toDouble) }
      }
      w
    } finally { if (!callerCached) { cached.unpersist(); () } }
  }

  /** Score every document under the trained weights: map-only. */
  def score(feat: DataFrame, w: Array[Double]): DataFrame = {
    val s = scoreCol(w)
    feat.select(col("doc_id"), s.as("score"),
      when(s >= 0.5, 1L).otherwise(0L).as("pred"))
  }
}
