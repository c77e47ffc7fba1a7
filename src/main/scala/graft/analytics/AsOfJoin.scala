package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (the temporal lookup Spark
  * has no built-in operator for).
  *
  * Implemented as the union-and-carry-forward rewrite, NOT a range
  * join: both sides are tagged, unioned, and shuffled ONCE on the key;
  * within each key partition, ordering by (ts, side) and a running
  * `last(right_payload, ignoreNulls)` carries the newest right row
  * forward into every subsequent left row. Cost is one shuffle +
  * one sort per side — no range explosion, no per-row binary search,
  * skew-safe for any key cardinality. Right rows tie-sort before left
  * rows at equal ts, so `<=` (inclusive) semantics hold.
  */
object AsOfJoin {

  /** `left` joined to the last-prior `right` row per `keys`.
    * Right payload columns surface as `asof_<name>` (null when no
    * prior right row exists — left-join semantics). `right` must be
    * unique per (keys, tsCol); pre-dedup it otherwise.
    */
  def lastPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(col): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(right.select(payload).schema.head.dataType)
          .as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        payload.as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }
}
