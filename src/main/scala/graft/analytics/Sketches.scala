package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Sketch aggregates (north-star extension): bounded-state summaries
  * that replace exact-but-shuffle-heavy aggregations at corpus scale,
  * built on the engine's portable hashing so results stay
  * deterministic and oracle-checkable.
  */
object Sketches {

  /** KMV distinct-count estimate over a pre-hashed long column
    * (use [[Dedup.h30]]); exact below `k` distinct values. O(k) state
    * per group with map-side partial aggregation — the sketch path
    * for distinct counting where `COUNT(DISTINCT)` would shuffle
    * every value. */
  def kmvDistinct(keyHash: Column, k: Int): Column =
    ColumnBridge.column(
      graft.expressions.KmvSketch(ColumnBridge.expression(keyHash), k,
        Dedup.P).toAggregateExpression())

  /** HyperLogLog distinct-count estimate over a pre-hashed 60-bit
    * long column (use [[Dedup.h60]]); `2^b` one-byte registers per
    * group — CONSTANT state regardless of cardinality (vs KMV's k
    * retained minima), relative error ~1.04/√(2^b), and sketches
    * merge by register-wise max, so per-partition/per-day summaries
    * roll up without rescanning raw data. Deterministic and
    * oracle-checkable: see [[graft.expressions.HllSketch]]. */
  def hllDistinct(keyHash: Column, b: Int = 8): Column =
    ColumnBridge.column(
      graft.expressions.HllSketch(
        ColumnBridge.expression(keyHash), b).toAggregateExpression())

  /** Count-min sketch over a pre-hashed 30-bit long column (use
    * [[Dedup.h30]]): d×w exact integer counters as `array<long>`
    * (row-major), constant state per group, element-wise-add merge.
    * Estimate point frequencies with [[cmsEstimate]]. */
  def cmsSketch(keyHash: Column, d: Int = 4, w: Int = 1024): Column =
    ColumnBridge.column(
      graft.expressions.CmsSketch(
        ColumnBridge.expression(keyHash), d, w).toAggregateExpression())

  /** Point frequency estimate from a [[cmsSketch]] array: min over
    * the d probed counters — plain Column arithmetic (replayable in
    * any SQL engine), never undercounts. `d`/`w` must match the
    * sketch build. */
  def cmsEstimate(sketch: Column, keyHash: Column, d: Int = 4,
      w: Int = 1024): Column = {
    import org.apache.spark.sql.functions._
    val probes = (0 until d).map { i =>
      val (a, b) = Dedup.hashCoeffs(i)
      element_at(sketch,
        (lit(i * w) + (keyHash * a + b) % Dedup.P % w + 1).cast("int"))
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }

  /** Deterministic k-row reservoir sample: values of the k rows with
    * the smallest (rowKeyHash, value) pairs — a uniform sample when
    * the hash is uniform over a unique row key ([[Dedup.h30]]).
    * O(k) state per group, map-side partials; quantiles over the
    * returned array replace a full per-group value shuffle at corpus
    * scale ([[sampleQuantile]]). */
  def hashReservoir(rowKeyHash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      graft.expressions.HashReservoir(
        ColumnBridge.expression(rowKeyHash),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** Discrete quantile of a sampled `array<double>`: the element at
    * 0-based index `floor(q·(n−1))` of the sorted sample — arithmetic
    * simple enough to be bit-identical in any SQL engine (no
    * interpolation, no engine-specific quantile definition). Null for
    * an empty sample. */
  def sampleQuantile(sample: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    val sorted = array_sort(sample)
    when(size(sample) > 0,
      element_at(sorted,
        (floor(lit(q) * (size(sample) - 1)) + 1).cast("int")))
  }
}
