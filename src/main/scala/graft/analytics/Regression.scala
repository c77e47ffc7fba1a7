package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Per-group ordinary least squares on exact integer power sums —
  * the distributed, hash-reproducible form of `regr_slope`/
  * `regr_intercept`/`regr_r2`.
  *
  * Spark's built-in regression aggregates stream doubles in
  * partition order, so their last bits depend on the partitioning;
  * here the five power sums (Σx, Σy, Σxy, Σx², Σy²) are exact
  * integers — x is integral by contract, y is scaled to cents
  * (corpus doubles carry ≤2 decimals) — accumulated as
  * DECIMAL(38,0), and each statistic is finished with a fixed,
  * engine-identical double expression. One groupBy with map-side
  * combine; nothing shuffles but the per-group sums.
  */
object Regression {

  private val D = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(D)

  /** OLS of `yCol` (double, ≤2 decimals) on `xCol` (integral) per
    * `groupCol`: returns (group, n, slope, intercept, r2) ordered by
    * group. Degenerate groups (constant x → zero variance) yield
    * null slope/intercept/r2; constant y makes r2 null (0/0 is
    * undefined, not 1). Null x or y rows are excluded. */
  def groupOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol),
        col(xCol).cast(LongType).as("x"),
        // exact: ≤2-decimal doubles scale to integral cents
        (col(yCol).cast(DecimalType(18, 2)) * lit(100))
          .cast(LongType).as("yc"))

    val sums = base.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d(col("x"))).as("sx"),
        sum(d(col("yc"))).as("sy"),
        sum(d(col("x") * col("yc"))).as("sxy"),
        sum(d(col("x") * col("x"))).as("sxx"),
        sum(d(col("yc") * col("yc"))).as("syy"))

    // exact integer numerators/denominators; ONE double conversion
    // each, then a fixed IEEE op sequence (mirrored in any oracle)
    val num = (d(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = (d(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val deny = (d(col("n")) * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val slope = when(den > 0d, num / den / lit(100.0))
    val intercept = when(den > 0d,
      (col("sy").cast("double") / lit(100.0) -
        (num / den / lit(100.0)) * col("sx").cast("double")) /
        col("n").cast("double"))
    val r2 = when(den > 0d && deny > 0d, num * num / (den * deny))
    sums.select(col(groupCol), col("n"),
        slope.as("slope"), intercept.as("intercept"), r2.as("r2"))
      .orderBy(groupCol)
  }
}
