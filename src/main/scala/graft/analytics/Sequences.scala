package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over an integer key domain — the completeness
  * audit for surrogate-keyed facts ("which orderkey ranges are
  * missing"), and the textbook interview pattern, distributed.
  *
  * The textbook form is `lead(k) OVER (ORDER BY k)` — one global
  * sort. Here keys are bucketed by value (`k div bucketWidth`), the
  * lead runs per bucket (keyed window), and cross-bucket gaps come
  * from a second pass over the per-bucket (min, max) summary — a
  * frame with keyspace/bucketWidth rows, smaller than the data by
  * the bucket width. Empty buckets between occupied ones are covered
  * by the boundary diff (prev bucket's max .. next bucket's min
  * spans them). Exact integer arithmetic throughout.
  */
object Sequences {

  /** Missing ranges of `keyCol`: (gap_start, gap_end, gap_len), every
    * maximal run of absent keys strictly between the observed min and
    * max. Nulls excluded; duplicates collapse. */
  def idGaps(df: DataFrame, keyCol: String,
      bucketWidth: Long = 100000L): DataFrame = {
    require(bucketWidth >= 2, "bucketWidth must be >= 2")
    val keys = df
      .where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"))
      .distinct()
      .withColumn("b", expr(s"k div $bucketWidth"))

    // within-bucket gaps: ordinary keyed window
    val wIn = Window.partitionBy("b").orderBy("k")
    val inner = keys
      .withColumn("nk", lead(col("k"), 1).over(wIn))
      .where(col("nk") - col("k") > 1)
      .select((col("k") + 1).as("gap_start"),
        (col("nk") - 1).as("gap_end"))

    // cross-bucket gaps: per-bucket summary frame, one row per
    // occupied bucket — the only unpartitioned window runs here
    // |buckets|-row window: single partition is the point
    val wB = Window.orderBy("b")
    val boundary = keys.groupBy("b")
      .agg(min("k").as("lo"), max("k").as("hi"))
      .withColumn("next_lo", lead(col("lo"), 1).over(wB))
      .where(col("next_lo").isNotNull && col("next_lo") - col("hi") > 1)
      .select((col("hi") + 1).as("gap_start"),
        (col("next_lo") - 1).as("gap_end"))

    inner.unionByName(boundary)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("gap_len"))
  }
}
