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

  /** Interval-OVERLAP join: every (a, b) pair with
    * `a.lo < b.hi AND b.lo < a.hi` (half-open intervals), as a binned
    * hash equi-join instead of the nested-loop plan the naive
    * inequality join gets. Both sides fan out to the `binWidth` bins
    * they span; a pair is emitted ONLY in the bin containing
    * `max(a.lo, b.lo)` — a point both intervals contain whenever they
    * overlap — so each overlapping pair appears exactly once with no
    * distinct/dedup pass. Fan-out ≈ len/binWidth + 1 per interval;
    * the join itself is a plain hash exchange on the bin id at any
    * scale.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      binWidth: Double): DataFrame = {
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("__bin") ===
          floor(greatest(col(aLo), col(bLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
