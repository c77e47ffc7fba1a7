package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `private[sql]` pieces of `Dataset#checkpoint` so an
  * eager reliable checkpoint can return its materialization count.
  *
  * `Dataset.checkpoint(eager = true)` runs an internal `count()` to
  * force materialization and THROWS THE RESULT AWAY; iterative
  * convergence loops (star contraction) then pay a separate count job
  * per iteration just to recover it. This replays the exact body of
  * `classic.Dataset#checkpoint` (`physicalPlan.execute().map(_.copy())`,
  * `rdd.checkpoint()`, eager count, `LogicalRDD.fromDataset(...)
  * .newInstance()` — which preserves the physical output partitioning
  * and ordering, the property that makes a checkpoint the right
  * materializer for shuffle-keyed iteration state) but hands the
  * eager count back to the caller: one fewer job per iteration.
  */
object CheckpointBridge {

  /** Reliable eager checkpoint of `df` + (row count, order-independent
    * content fingerprint) observed while materializing it — both ride
    * the one job that forces the checkpoint, so a convergence loop
    * needs NO extra action per iteration. The fingerprint is the XOR
    * of per-row UnsafeRow hashes (content-deterministic within a
    * session; XOR is a faithful digest of a DISTINCT row set): equal
    * sets always produce equal fingerprints, so a fingerprint gate
    * can only err by letting a spurious exact-confirmation run, never
    * by missing a change. The caller must have a checkpoint dir set.
    */
  def checkpointWithStats(
      df: org.apache.spark.sql.DataFrame,
      local: Boolean = false): (org.apache.spark.sql.DataFrame, Long, Long) = {
    val cds = df.asInstanceOf[Dataset[Row]]
    val internalRdd = cds.queryExecution.executedPlan.execute().map(_.copy())
    if (local) internalRdd.localCheckpoint() else internalRdd.checkpoint()
    val (n, fp) = internalRdd.aggregate((0L, 0L))(
      // spread the 32-bit row hash over 64 bits (splitmix64 finalizer)
      // before XOR so fingerprints of small integer-ish rows do not
      // cancel structurally
      (acc, row) => {
        var h = row.hashCode().toLong * 0x9e3779b97f4a7c15L
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        (acc._1 + 1L, acc._2 ^ (h ^ (h >>> 31)))
      },
      (a, b) => (a._1 + b._1, a._2 ^ b._2))
    val logicalRdd = LogicalRDD
      .fromDataset(internalRdd, cds, isStreaming = false).newInstance()
    (Dataset.ofRows(cds.sparkSession, logicalRdd), n, fp)
  }
}
