package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023). Each document is scored by how much
  * more likely its tokens are under a TARGET distribution (a small
  * high-quality / in-domain subset) than under the RAW corpus
  * distribution, with both distributions estimated over a fixed
  * number of hash buckets so the model state is bounded:
  *
  *   logweight(d) = Σ_tok λ_{bucket(tok)}
  *   λ_b = ln( (t_b+1) / (T+B) ) − ln( (r_b+1) / (R+B) )
  *
  * (add-one smoothing; t/r = target/raw bucket counts, T/R totals,
  * B = bucket count). Selection then keeps the top-weight fraction —
  * the weight is the operator; thresholding composes with
  * [[Sampling]].
  *
  * Scale shape (the reason hashed DSIR works at 100 TB): the model is
  * the B-row bucket table — ONE map-side-combined shuffle on ~B keys
  * builds it, it broadcasts to every executor, and scoring is a
  * second map-side-combined (doc, bucket) aggregation + a broadcast
  * join. No vocabulary-sized state, no driver collect of anything
  * data-sized.
  *
  * Determinism contract (oracle-checkable): token bucketing uses the
  * portable md5 hash ([[Dedup.h30]] mod B); λ_b is quantized to 1e-12
  * after its two `ln` calls (the engine's q117/q121 convention); each
  * doc's contributions `c·λ_b` are summed by an explicit fold over
  * the SORTED contribution list, so Spark's `aggregate` and DuckDB's
  * `list_reduce` run the identical IEEE chain under any partitioning.
  */
object Dsir {

  /** Per-document importance weights. `docs` rows with null `textCol`
    * are ignored. Output: (idCol, is_target, n_tokens, logweight),
    * one row per scored document. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), isTarget.as("is_target"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .select(col(idCol), col("is_target"),
        (Dedup.h30(col("tok")) % buckets).as("bucket"))

    // The model: B rows of (bucket, target count, raw count).
    val stats = toks.groupBy("bucket")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("t_c"),
        count(lit(1)).as("r_c"))
    val totals = stats.agg(sum("t_c").as("tt"), sum("r_c").as("rt"))
    val lam = stats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (round((log((col("t_c") + 1).cast("double") /
            (col("tt") + buckets).cast("double")) -
          log((col("r_c") + 1).cast("double") /
            (col("rt") + buckets).cast("double"))) * 1e12) / 1e12)
          .as("lam"))

    // Score: per-doc bucket counts x broadcast λ, sorted-fold sum.
    val docBuckets = toks.groupBy(col(idCol), col("is_target"),
        col("bucket"))
      .agg(count(lit(1)).as("c"))
    docBuckets.join(broadcast(lam), "bucket")
      .select(col(idCol), col("is_target"), col("c"),
        (col("c").cast("double") * col("lam")).as("x"))
      .groupBy(col(idCol), col("is_target"))
      .agg(sum("c").cast("long").as("n_tokens"),
        array_sort(collect_list(col("x"))).as("xs"))
      .select(col(idCol), col("is_target"), col("n_tokens"),
        aggregate(col("xs"), lit(0.0), (a, x) => a + x).as("logweight"))
  }
}
