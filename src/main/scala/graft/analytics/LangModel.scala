package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical n-gram language-model scoring — the CCNet-style
  * perplexity quality filter of a training-data pipeline (Wenzek et
  * al. 2020: score every document under a small LM, keep the
  * low-perplexity "head" of the distribution, drop or down-weight the
  * "tail"). The reference pipeline has no LM tier; this generalizes
  * its rule-based quality scoring (`etl/transform/` cleaning
  * heuristics) to a trained statistical scorer.
  *
  * Model: add-α smoothed token bigrams trained on the scored corpus
  * itself (self-scoring, the common bootstrap when no external LM
  * corpus is available):
  *
  *   P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V)
  *
  * with c(w₁·) the count of bigrams starting at w₁ and V the corpus
  * vocabulary size. Document score = per-bigram cross-entropy
  * −(1/n)·Σ ln P — lower is more fluent/typical, exp(ce) is the
  * perplexity.
  *
  * Scale shape: the token stream explodes once; bigram counts and
  * context counts are vocabulary-sized aggregations of that stream
  * (map-side combined, one keyed shuffle each — the (w₁,w₂) exchange
  * is shared between the count aggregate and the scoring join via
  * identical-exchange reuse); the scoring join attaches vocab-sized
  * count tables back to the stream (AQE broadcasts them when small);
  * the per-document reduce is one doc-keyed shuffle. Nothing is ever
  * corpus × corpus, and the only driver scalar is (V, one long).
  *
  * Determinism (oracle contract): the per-document Σ ln P is a
  * position-sorted left fold, not an unordered float sum (double
  * addition is not associative); `ln` itself differs from C libm in
  * the last ulp on ~0.1% of inputs, so oracle comparisons round the
  * final score to 4 decimals (the verified bround/round_even idiom,
  * see [[Relevance]]).
  */
object LangModel {

  /** Lowercased whitespace tokens — the same tokenizer the relevance
    * tier uses. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Positioned adjacent-token stream: one (doc_id, i, w1, w2) row per
    * bigram, i = 1-based position of w1. Documents with fewer than two
    * tokens have no bigrams and drop out here.
    */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(i.as("i"),
          element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.i").as("i"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-document cross-entropy under the corpus-trained bigram model:
    * (doc_id, ce, n_bigrams) with ce = −(1/n)·Σ ln P(w₂|w₁), the sum
    * position-ordered. Exposes the exact doubles; callers that
    * hash-compare against another engine round (see class doc).
    */
  def bigramCrossEntropy(docs: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.1): DataFrame = {
    val big = bigrams(docs, idCol, textCol)
    // V: corpus vocabulary (distinct tokens over ALL positions, not
    // just bigram starts) — one scalar aggregation, the model's only
    // driver-side state
    val vocab = docs.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w"))).collect()(0).getLong(0)
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val logp = log((col("c2") + alpha) / (col("c1") + alpha * vocab))
    big.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col("doc_id"), col("i"), logp.as("logp"))
      .groupBy("doc_id")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("i"), col("logp")))),
          lit(0.0),
          (acc, x) => acc + x.getField("logp")).as("__sum"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"),
        (-col("__sum") / col("n_bigrams")).as("ce"),
        col("n_bigrams"))
  }

  /** Positioned trigram stream: one (doc_id, i, w1, w2, w3) row per
    * trigram. Documents with fewer than three tokens drop out. */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__t")) - 2),
        i => struct(i.as("i"),
          element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2"),
          element_at(col("__t"), i + 2).as("w3")))).as("b"))
      .select(col("doc_id"), col("b.i").as("i"), col("b.w1").as("w1"),
        col("b.w2").as("w2"), col("b.w3").as("w3"))

  /** Per-document cross-entropy under an interpolated Kneser–Ney
    * trigram model trained on the scored corpus (Kneser & Ney 1995;
    * the modified-KN fixed-discount form with a single discount D):
    *
    *   P(w₃|w₁w₂) = max(c(w₁w₂w₃)−D, 0)/c(w₁w₂·)
    *                + D·N₁₊(w₁w₂·)/c(w₁w₂·) · P(w₃|w₂)
    *   P(w₃|w₂)   = max(N₁₊(·w₂w₃)−D, 0)/N₁₊(·w₂·)
    *                + D·N₁₊(w₂·)/N₁₊(·w₂·) · P_cont(w₃)
    *   P_cont(w₃) = N₁₊(·w₃)/N₁₊(··)
    *
    * Self-scoring means every scored trigram was seen in training, so
    * every denominator is positive. This is the CCNet quality filter
    * one modeling order up from [[bigramCrossEntropy]] — continuation
    * counts make it far less degenerate on repeated boilerplate than
    * raw MLE counts.
    *
    * Scale shape: the trigram stream explodes once; all six count
    * tables are vocabulary-sized keyed aggregations of it (map-side
    * combined) joined back to the stream (AQE broadcasts the small
    * ones); the only driver scalar is N₁₊(··), one long. Per-document
    * reduce is one doc-keyed shuffle.
    *
    * Determinism: counts are exact integers; the probability is one
    * fixed double expression tree over them (both engines evaluate the
    * identical shape); Σ ln P folds position-sorted; callers round the
    * final score to 4 decimals for cross-engine comparison (ln ulp —
    * see class doc of [[bigramCrossEntropy]]).
    */
  def knTrigramCrossEntropy(docs: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    val tri = trigrams(docs, idCol, textCol)
    val bigTypes = bigrams(docs, idCol, textCol)
      .select("w1", "w2").distinct()
    val c3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val ctx = tri.groupBy("w1", "w2").agg(count(lit(1)).as("c2ctx"),
      count_distinct(col("w3")).as("n1f2"))
    val mid = tri.groupBy("w2", "w3")
      .agg(count_distinct(col("w1")).as("m23"))
    val mid2 = mid.groupBy("w2").agg(sum(col("m23")).as("mid2"))
    val fb = bigTypes.groupBy(col("w1").as("w2"))
      .agg(count(lit(1)).as("n1fb2"))
    val ct = bigTypes.groupBy(col("w2").as("w3"))
      .agg(count(lit(1)).as("contw3"))
    // N₁₊(··): total distinct bigram types — the model's only driver
    // scalar (mirrors the vocab scalar of the bigram tier)
    val b = bigTypes.count()
    val d = lit(discount)
    val p =
      (greatest(col("c3").cast("double") - d, lit(0.0)) /
        col("c2ctx").cast("double")) +
        ((d * col("n1f2").cast("double") / col("c2ctx").cast("double")) *
          ((greatest(col("m23").cast("double") - d, lit(0.0)) /
            col("mid2").cast("double")) +
            ((d * col("n1fb2").cast("double") /
              col("mid2").cast("double")) *
              (col("contw3").cast("double") / lit(b.toDouble)))))
    tri.join(c3, Seq("w1", "w2", "w3"))
      .join(ctx, Seq("w1", "w2"))
      .join(mid, Seq("w2", "w3"))
      .join(mid2, Seq("w2"))
      .join(fb, Seq("w2"))
      .join(ct, Seq("w3"))
      .select(col("doc_id"), col("i"), log(p).as("logp"))
      .groupBy("doc_id")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("i"), col("logp")))),
          lit(0.0),
          (acc, x) => acc + x.getField("logp")).as("__sum"),
        count(lit(1)).as("n_trigrams"))
      .select(col("doc_id"),
        (-col("__sum") / col("n_trigrams")).as("ce"),
        col("n_trigrams"))
  }

  /** CCNet-style quality bucketing of the rounded score: fixed
    * thresholds (CCNet publishes per-language cutoff tables computed
    * offline; these are the corpus-calibrated equivalents), strict
    * `<` head, inclusive middle, `>` tail. Comparisons are between a
    * 4-decimal-rounded double and exact double literals — portable.
    */
  def ceBucket(ce4: Column, headBelow: Double, tailAbove: Double): Column =
    when(ce4 < headBelow, "head")
      .when(ce4 > tailAbove, "tail")
      .otherwise("middle")
}
