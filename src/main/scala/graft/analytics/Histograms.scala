package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram construction — the column-statistics operator a catalog /
  * cost-based optimizer collects (the engine's q54 profiler covers
  * rows/nulls/NDV/extremes; these add the value-distribution shape).
  *
  * Scale shape: one scalar-aggregation job for the bucket model
  * (min/max, or the k−1 exact quantile boundaries), broadcast to a
  * single map-side-combined groupBy over ≤ k keys — no per-value
  * shuffle beyond what the boundary computation itself needs. Only
  * non-empty buckets are returned.
  *
  * Determinism: bucket arithmetic is plain IEEE double math replayed
  * identically by the DuckDB oracle; equi-depth boundaries use exact
  * interpolated quantiles (Spark `percentile` ≡ DuckDB
  * `quantile_cont`, the q47-established equivalence). Ties on an
  * equi-depth boundary land in the LOWER bucket (strict `>`
  * comparison against each boundary).
  */
object Histograms {

  /** Functional-dependency profile — does column A determine column
    * B? The schema-discovery / data-contract check: per candidate
    * (lhs → rhs), how many lhs keys map to MORE than one distinct
    * rhs value (violations), and the worst fan-out. A clean FD
    * (0 violations) is a join-safe lookup; a dirty one is a
    * denormalization bug or a genuinely multi-valued relationship.
    *
    * One (lhs, rhs)-distinct aggregation per candidate, all exact
    * BIGINTs with one double division. Rows with a null on either
    * side are excluded (nulls assert nothing about the dependency).
    *
    * Returns one row per candidate: (lhs, rhs, n_keys,
    * n_violating, max_fanout, violation_rate).
    */
  def fdProfile(df: DataFrame,
      candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate FD")
    candidates.map { case (a, b) =>
      df.where(col(a).isNotNull && col(b).isNotNull)
        .select(col(a).as("k"), col(b).as("v")).distinct()
        .groupBy("k").agg(count(lit(1)).as("fan"))
        .agg(count(lit(1)).as("n_keys"),
          sum((col("fan") > 1).cast("long")).as("n_violating"),
          max(col("fan")).as("max_fanout"))
        .select(lit(a).as("lhs"), lit(b).as("rhs"),
          col("n_keys").cast("long"),
          col("n_violating").cast("long"),
          col("max_fanout").cast("long"),
          (col("n_violating").cast("double") /
            col("n_keys").cast("double")).as("violation_rate"))
    }.reduce(_ unionByName _).orderBy("lhs", "rhs")
  }

  /** Per-group percent-rank normalization — make scores comparable
    * ACROSS strata before a global threshold ("top 10% of every
    * language", not "top 10% overall, which is all English"): each
    * row gets (rank−1)/(n−1) within its group, ties sharing a rank.
    * Spark's `percent_rank` and DuckDB's agree on this definition
    * exactly, so the normalized scores are engine-portable with no
    * quantization step.
    *
    * One group-partitioned window — no global sort. Returns the
    * input keys plus `pr` ∈ [0, 1] (0 for a single-row group).
    */
  def percentRankNormalize(df: DataFrame, groupCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    df.select(col(idCol).as("id"), col(groupCol).as("g"),
        col(valueCol).as("v"))
      .where(col("id").isNotNull && col("g").isNotNull &&
        col("v").isNotNull)
      .withColumn("pr", percent_rank().over(w))
  }

  /** Hill tail-index estimator (Hill 1975) over the k largest values
    * — "how heavy is this distribution's tail" as one number: for
    * order statistics X₍₁₎ ≥ … ≥ X₍ₖ₊₁₎,
    *
    *   α̂ = k / Σ_{i≤k} (ln X₍ᵢ₎ − ln X₍ₖ₊₁₎)
    *
    * Small α (≈1–2) = power-law-heavy (a degree or frequency column
    * whose hubs will skew every keyed shuffle — the quantitative
    * trigger for salting / AQE skew handling); large α = thin tail.
    *
    * Scale shape: one global top-(k+1) (TakeOrdered — never a full
    * sort) followed by a (k+1)-row aggregation. Determinism: each ln
    * is quantized to 1e-12 units and summed as exact longs (the
    * engine-portable recipe of the entropy/JSD queries); boundary
    * ties are value-equal, so which tied rows the top-(k+1) keeps
    * cannot change any aggregate.
    *
    * Output (one row): k (actual tail size used, = min(k, n−1)),
    * x_tail = X₍ₖ₊₁₎, alpha (null when fewer than k+1 positive
    * values or a constant tail). */
  def hillTailIndex(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, "hillTailIndex needs k >= 2")
    val top = df.select(value.cast("double").as("x"))
      .where(col("x").isNotNull && col("x") > 0)
      .orderBy(col("x").desc).limit(k + 1)
    val q = round(log(col("x")) * 1e12).cast("long")
    top.agg(count(lit(1)).as("n"), min(col("x")).as("x_tail"),
        sum(q).as("s"), min(q).as("q_tail"))
      .select((col("n") - 1).cast("long").as("k"), col("x_tail"),
        when(col("n") === (k + 1) &&
            col("s") - col("q_tail") * (k + 1) > 0,
          lit(k.toDouble) * 1e12 /
            (col("s") - col("q_tail") * (k + 1)).cast("double"))
          .as("alpha"))
  }

  /** Equi-width: k same-width buckets spanning [min, max]; the top
    * bucket is closed (a value equal to max lands in bucket k−1).
    * Output: (bucket, lo, hi, n_rows), non-empty buckets only. */
  def equiWidth(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 1, "equiWidth needs k >= 1")
    val src = df.where(value.isNotNull)
    val stats = src.agg(min(value).as("__lo"), max(value).as("__hi"))
    val w = (col("__hi") - col("__lo")) / lit(k)
    src.crossJoin(broadcast(stats))
      .select(
        when(col("__hi") === col("__lo"), 0)
          .otherwise(least(floor((value - col("__lo")) / w), lit(k - 1)))
          .cast("int").as("bucket"),
        col("__lo"), col("__hi"))
      .select(col("bucket"),
        (col("__lo") + col("bucket") * w).as("lo"),
        (col("__lo") + (col("bucket") + 1) * w).as("hi"))
      .groupBy("bucket", "lo", "hi")
      .agg(count(lit(1)).cast("long").as("n_rows"))
  }

  /** Quantile winsorization (adaptive outlier clipping — the
    * data-driven upgrade of the cleaning tier's fixed-range clamps):
    * per group, values below the `lo` quantile or above the `hi`
    * quantile are clipped to those bounds. Returns the input rows
    * plus `__p_lo` / `__p_hi` (the group's bounds) and `clippedCol`.
    * The bounds frame is group-count-sized and broadcast — one
    * quantile job, then a map-side join. */
  def clipQuantiles(df: DataFrame, value: Column,
      groupCols: Seq[String], lo: Double, hi: Double,
      clippedCol: String = "clipped"): DataFrame = {
    require(lo < hi && lo >= 0 && hi <= 1,
      s"clipQuantiles needs 0 <= lo < hi <= 1, got [$lo, $hi]")
    val src = df.where(value.isNotNull)
    val bounds = src.groupBy(groupCols.map(col): _*)
      .agg(percentile(value, lit(lo)).as("__p_lo"),
        percentile(value, lit(hi)).as("__p_hi"))
    src.join(broadcast(bounds), groupCols)
      .withColumn(clippedCol,
        greatest(least(value, col("__p_hi")), col("__p_lo")))
  }

  /** Robust outlier report per group: median, MAD (median absolute
    * deviation), and the count of values beyond `k`·1.4826·MAD of
    * the median — the Hampel filter, immune to the outliers it
    * hunts (mean/stddev z-scores move with every outlier; the
    * breakdown point of MAD is 50%). 1.4826 ≈ 1/Φ⁻¹(3/4) makes the
    * threshold comparable to k standard deviations under normality.
    *
    * Two quantile jobs + two broadcast joins of group-count-sized
    * bound frames; the exact interpolated `percentile` is identical
    * to DuckDB's `quantile_cont`, so results hash-match. A zero MAD
    * (>50% of the group at the median) flags every off-median value,
    * the standard Hampel degeneracy — callers wanting leniency there
    * should clip instead. */
  def madOutliers(df: DataFrame, value: Column,
      groupCols: Seq[String], k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val src = df.where(value.isNotNull)
    val gc = groupCols.map(col)
    val med = src.groupBy(gc: _*)
      .agg(percentile(value, lit(0.5)).as("__med"))
    val dev = src.join(broadcast(med), groupCols)
      .withColumn("__dev", abs(value - col("__med")))
    val mad = dev.groupBy((gc :+ col("__med")): _*)
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    dev.drop("__med").join(broadcast(mad), groupCols)
      .groupBy((gc :+ col("__med") :+ col("__mad")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dev") >
            col("__mad") * lit(1.4826) * lit(k), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(gc ++ Seq(col("n"), col("__med").as("med"),
        col("__mad").as("mad"), col("n_outliers"),
        (col("n_outliers").cast("double") / col("n").cast("double"))
          .as("outlier_ratio")): _*)
  }

  /** Equi-depth: k buckets of ~equal row count, edges at the exact
    * interpolated i/k quantiles; boundary ties go to the lower
    * bucket. Output: (bucket, lo, hi, n_rows), non-empty buckets
    * only. */
  def equiDepth(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, "equiDepth needs k >= 2")
    val src = df.where(value.isNotNull)
    val fr = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val stats = src.agg(percentile(value, fr).as("__bs"),
      min(value).as("__lo"), max(value).as("__hi"))
    // bucket = #boundaries strictly below the value. The obvious
    // size(filter(__bs, b => value > b)) is a higher-order function —
    // interpreted per row, breaking whole-stage codegen for the whole
    // scan (guide §1.2 per-task work); the boundary count is fixed and
    // small, so an unrolled boolean sum computes the identical count
    // inside codegen.
    val bucketOf = (1 until k)
      .map(i => (value > element_at(col("__bs"), i)).cast("int"))
      .reduce(_ + _)
    src.crossJoin(broadcast(stats))
      .select(
        bucketOf.as("bucket"),
        col("__bs"), col("__lo"), col("__hi"))
      .select(col("bucket"),
        when(col("bucket") === 0, col("__lo"))
          .otherwise(element_at(col("__bs"), col("bucket"))).as("lo"),
        when(col("bucket") === k - 1, col("__hi"))
          .otherwise(element_at(col("__bs"), col("bucket") + 1)).as("hi"))
      .groupBy("bucket", "lo", "hi")
      .agg(count(lit(1)).cast("long").as("n_rows"))
  }
}
