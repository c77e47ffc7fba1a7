package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — pairs each point with every
  * interval containing it. Spark would plan the naive inequality join
  * as a broadcast-nested-loop; this is the binned rewrite: intervals
  * fan out to the fixed-width bins they overlap, points map to their
  * bin, and the join becomes a hash equi-join on bin id with an exact
  * residual filter. Bin width should be on the order of the typical
  * interval length (fan-out ≈ len/width + 1 rows per interval).
  */
object RangeJoin {

  /** Join `points` (col `pointCol`) to `intervals`
    * ([loCol, hiCol) half-open) via `binWidth`-sized bins. Output =
    * all point columns + all interval columns, exactly the rows of the
    * naive `p >= lo AND p < hi` join.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    p.join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
