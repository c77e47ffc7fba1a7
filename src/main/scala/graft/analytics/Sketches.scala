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
}
