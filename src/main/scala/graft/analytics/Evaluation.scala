package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scoring-model evaluation: exact ROC AUC (Mann–Whitney rank-sum
  * form, average ranks over ties), Gini, and the Kolmogorov–Smirnov
  * statistic of a continuous score against a binary label.
  *
  * The textbook computation ranks every row with ONE global sort — a
  * single-partition window that dies at corpus scale. Here the rank
  * sums come from a distributed prefix-sum instead:
  *
  *   1. collapse rows to distinct scores (one keyed shuffle; ties
  *      collapse to a (cnt, pos) pair per score);
  *   2. range-bucket the distinct scores by value into `buckets`
  *      fixed intervals (needs only the score min/max — one cheap
  *      2-value aggregate); bucket ids only steer the partition
  *      layout — the prefix sums, and thus the result, are
  *      bucket-independent;
  *   3. per-bucket totals (≤ `buckets` rows) give exclusive
  *      cross-bucket offsets via a window over that TINY frame;
  *   4. within each bucket, an ordinary partitioned window computes
  *      the exclusive within-bucket cumsum; offset + cumsum = the
  *      exact global rank prefix for every distinct score, with no
  *      global sort and no partition ever holding more than one
  *      bucket's distinct scores.
  *
  * Determinism: every sum is exact (DECIMAL(38,0) — no overflow
  * below ~10¹⁹ rows), and the only floating-point steps are the
  * final numerator/denominator casts and ONE division each for AUC
  * and KS — bit-identical in any engine at any parallelism.
  *
  *   AUC = (S2 − P(P+1)) / (2PN)   where
  *   S2  = Σ_g pos_g · (2·cntBefore_g + cnt_g + 1)   (twice the
  *         average-rank sum of positives, an exact integer)
  *   KS  = max_g |cumPos_g·N − cumNeg_g·P| / (P·N)
  */
object Evaluation {

  private val D = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(D)

  /** One-row evaluation report: n, n_pos, n_neg (BIGINT), auc, gini,
    * ks (DOUBLE). Null-score / null-label rows are excluded.
    * Degenerate inputs (empty, or a single class) yield null
    * auc/gini/ks rather than a division error. */
  def scoreEval(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val g = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
      .withColumn("neg", col("cnt") - col("pos"))

    val bounds = g.agg(min("score").as("lo"), max("score").as("hi"))
      .collect()(0)
    if (bounds.isNullAt(0)) return emptyReport(df)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = hi - lo
    val bucket =
      if (span <= 0d) lit(0)
      else least(lit(buckets - 1),
        floor((col("score") - lit(lo)) / lit(span) * lit(buckets))
          .cast("int"))
    val gb = g.withColumn("b", bucket)

    // exclusive cross-bucket offsets over the ≤`buckets`-row frame
    // (the unpartitioned window is safe: its input is bucket totals,
    // never rows)
    val wOff = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = gb.groupBy("b")
      .agg(sum("cnt").as("bc"), sum("pos").as("bp"), sum("neg").as("bn"))
      .select(col("b"),
        coalesce(sum("bc").over(wOff), lit(0L)).as("off_c"),
        coalesce(sum("bp").over(wOff), lit(0L)).as("off_p"),
        coalesce(sum("bn").over(wOff), lit(0L)).as("off_n"))

    // exclusive within-bucket cumsums + offsets = exact global
    // prefixes per distinct score
    val wIn = Window.partitionBy("b").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = gb.join(broadcast(offsets), Seq("b"))
      .select(col("score"), col("cnt"), col("pos"), col("neg"),
        (col("off_c") + coalesce(sum("cnt").over(wIn), lit(0L)))
          .as("cb"),
        (col("off_p") + coalesce(sum("pos").over(wIn), lit(0L)))
          .as("cbp"),
        (col("off_n") + coalesce(sum("neg").over(wIn), lit(0L)))
          .as("cbn"))

    // class totals (single broadcast row) feed the per-group KS term
    val tot = g.agg(
      sum("cnt").cast("long").as("n"),
      sum("pos").cast("long").as("n_pos"),
      sum("neg").cast("long").as("n_neg"))

    val agg = pre.crossJoin(broadcast(tot))
      .agg(
        first("n").as("n"),
        first("n_pos").as("n_pos"),
        first("n_neg").as("n_neg"),
        sum(d(col("pos")) *
          (d(lit(2)) * d(col("cb")) + d(col("cnt")) + d(lit(1))))
          .as("s2"),
        max(abs(
          d(col("cbp") + col("pos")) * d(col("n_neg")) -
            d(col("cbn") + col("neg")) * d(col("n_pos"))))
          .as("ks_num"))

    val ok = col("n_pos") > 0 && col("n_neg") > 0
    val aucNum = col("s2") - d(col("n_pos")) * (d(col("n_pos")) + d(lit(1)))
    val aucDen = d(lit(2)) * d(col("n_pos")) * d(col("n_neg"))
    val ksDen = d(col("n_pos")) * d(col("n_neg"))
    val auc = when(ok,
      aucNum.cast("double") / aucDen.cast("double"))
    agg.select(col("n"), col("n_pos"), col("n_neg"),
      auc.as("auc"),
      (lit(2.0) * auc - lit(1.0)).as("gini"),
      when(ok, col("ks_num").cast("double") / ksDen.cast("double"))
        .as("ks"))
  }

  private def emptyReport(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    Seq((0L, 0L, 0L)).toDF("n", "n_pos", "n_neg")
      .select(col("n"), col("n_pos"), col("n_neg"),
        lit(null).cast("double").as("auc"),
        lit(null).cast("double").as("gini"),
        lit(null).cast("double").as("ks"))
  }
}
