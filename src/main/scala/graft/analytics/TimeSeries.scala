package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series scalar helpers shared by the event-stream queries. */
object TimeSeries {

  /** Day-of-week seasonal decomposition of a per-group daily series
    * (classical additive decomposition, the moving-average step of
    * STL): trend = 7-row centered moving average, seasonal = per-DOW
    * mean of the detrended values. Input rows are (group, day,
    * cents) — one row per observed day, metric as an exact integer.
    *
    * Determinism: a naive implementation subtracts a double trend
    * and averages double residuals — partition-order dependent. Here
    * the detrended value is kept RATIONAL: over full 7-row windows,
    * 7·y_c − Σ_window y_c is an exact integer, per-DOW sums of it
    * are exact, and `seasonal` is ONE double division at the end
    * (÷ 7·100·n_days). Edge rows without a full window carry no
    * defined centered trend and are excluded — standard for centered
    * MA.
    *
    * Output: (group, dow [1=Mon..7=Sun], n_days, seasonal) ordered
    * by (group, dow). Shuffles: one per-group window sort + one
    * (group, dow) aggregation — nothing row-pairwise.
    */
  def dowSeasonality(daily: DataFrame, groupCol: String,
      dayCol: String, centsCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("__ws", sum(col(centsCol).cast(D)).over(w))
      .where(col("__wn") === 7)
      .withColumn("__det",
        lit(7).cast(D) * col(centsCol).cast(D) - col("__ws"))
    det
      .groupBy(col(groupCol),
        (weekday(col(dayCol)) + 1).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__det")).as("__s"))
      .select(col(groupCol), col("dow"), col("n_days"),
        (col("__s").cast("double") /
          (lit(700.0) * col("n_days").cast("double")))
          .as("seasonal"))
      .orderBy(groupCol, "dow")
  }

  /** Seasonal-adjusted anomaly days — the composition every ops
    * dashboard actually wants from a seasonal decomposition: remove
    * the 7-day centered trend AND the day-of-week effect, then gate
    * the residuals with the Hampel robust rule (median ± k·1.4826·MAD
    * — 50% breakdown point, so the anomalies themselves cannot drag
    * the threshold the way a z-score's mean/σ would). A raw daily
    * outlier rule flags every Saturday of a weekend-heavy metric;
    * this flags the days that deviate from their OWN weekday's norm.
    *
    * Determinism: the detrended value 7·y_c − Σ_window is an exact
    * integer (the [[dowSeasonality]] contract); the per-(group,dow)
    * seasonal is its rounded mean (ONE double division + round —
    * reproducible); residual = det − seasonal is back to exact
    * integers; median/MAD are interpolated percentiles over integers
    * (the [[Histograms.madOutliers]] `percentile ≡ quantile_cont`
    * contract) and the gate multiplies in a fixed order.
    *
    * Output: only the anomalous rows — (group, day, cents, residual,
    * med, mad), ordered by (group, day). Residual units are
    * 7 × cents (the detrend multiplies by the window size; the gate
    * is scale-invariant). Edge days without a full centered window
    * are excluded, as in [[dowSeasonality]].
    */
  def seasonalAnomalies(daily: DataFrame, groupCol: String,
      dayCol: String, centsCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val D = DecimalType(38, 0)
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("__ws", sum(col(centsCol).cast(D)).over(w))
      .where(col("__wn") === 7)
      .withColumn("__det",
        (lit(7).cast(D) * col(centsCol).cast(D) - col("__ws"))
          .cast("long"))
      .withColumn("__dow", weekday(col(dayCol)) + 1)
    val seas = det.groupBy(col(groupCol), col("__dow"))
      .agg(round(sum(col("__det")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("__sd"))
    val resid = det.join(seas, Seq(groupCol, "__dow"))
      .withColumn("__r", col("__det") - col("__sd"))
    val med = resid.groupBy(groupCol)
      .agg(percentile(col("__r"), lit(0.5)).as("__med"))
    val dev = resid.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev",
        abs(col("__r").cast("double") - col("__med")))
    val mad = dev.groupBy(col(groupCol), col("__med"))
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    dev.drop("__med").join(broadcast(mad), Seq(groupCol))
      .where(col("__dev") > col("__mad") * lit(1.4826) * lit(k))
      .orderBy(groupCol, dayCol)
      .select(col(groupCol),
        date_format(col(dayCol), "yyyy-MM-dd").as(dayCol),
        col(centsCol), col("__r").as("residual"),
        col("__med").as("med"), col("__mad").as("mad"))
  }

  /** Trailing rolling correlation between two aligned integer series
    * (one row per period, columns `xCol`/`yCol` in exact cents):
    * Pearson over the last `window` rows, emitted only for full
    * windows. All five power sums accumulate exactly inside the
    * window frame (DECIMAL(38,0)); each correlation is the fixed
    * double finish. The window is UNPARTITIONED by design — the
    * input is a PERIOD-grain series (≤ one row per day), so its size
    * is calendar-bounded, the same argument as the ≤64-row offset
    * frame in [[Evaluation.scoreEval]]; never point this at
    * row-grain data. */
  def rollingCorr(series: DataFrame, dayCol: String, xCol: String,
      yCol: String, window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val D = DecimalType(38, 0)
    def d(c: Column): Column = c.cast(D)
    // |buckets|-row window: single partition is the point
    val w = Window.orderBy(dayCol).rowsBetween(-(window - 1), 0)
    val x = col(xCol)
    val y = col(yCol)
    val withSums = series
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(d(x)).over(w))
      .withColumn("__sy", sum(d(y)).over(w))
      .withColumn("__sxx", sum(d(x * x)).over(w))
      .withColumn("__syy", sum(d(y * y)).over(w))
      .withColumn("__sxy", sum(d(x * y)).over(w))
      .where(col("__n") === window)
    val num = (d(lit(window)) * col("__sxy") -
      col("__sx") * col("__sy")).cast("double")
    val dx = (d(lit(window)) * col("__sxx") -
      col("__sx") * col("__sx")).cast("double")
    val dy = (d(lit(window)) * col("__syy") -
      col("__sy") * col("__sy")).cast("double")
    withSums.select(col(dayCol),
      when(dx > 0d && dy > 0d, num / (sqrt(dx) * sqrt(dy)))
        .as("corr"))
  }

  /** CUSUM change-point scan per group: the day k maximizing
    * |S_k| = |Σ_{i≤k}(y_i − ȳ)| over the group's daily series — the
    * classic single-change-point location statistic (Page 1954;
    * the max-|CUSUM| form of Taylor's changepoint bootstrap).
    *
    * Exactness: n·S_k = n·C_k − k·T (C_k = running sum, T = total,
    * all in integer cents) — the mean never becomes a double, so the
    * argmax is exact; ties resolve to the EARLIEST day. `cusum_stat`
    * = max|n·S_k| / (n·100) in metric units, one double division.
    *
    * Output: (group, n_days, change_day yyyy-MM-dd, cusum_stat).
    * One per-group window pass + one per-group argmax aggregation.
    */
  def cusumChangePoint(daily: DataFrame, groupCol: String,
      dayCol: String, centsCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val wOrd = Window.partitionBy(groupCol).orderBy(dayCol)
    val wAll = Window.partitionBy(groupCol)
    val scored = daily
      .withColumn("__k", row_number().over(wOrd).cast(D))
      .withColumn("__c",
        sum(col(centsCol).cast(D)).over(
          wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(wAll).cast(D))
      .withColumn("__t", sum(col(centsCol).cast(D)).over(wAll))
      .withColumn("__ns",
        abs(col("__n") * col("__c") - col("__k") * col("__t")))
    scored
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"),
        max(struct(col("__ns").as("ns"),
          (lit(0).cast(D) - col("__k")).as("negk"),
          date_format(col(dayCol), "yyyy-MM-dd").as("day")))
          .as("__best"))
      .select(col(groupCol), col("n_days"),
        col("__best.day").as("change_day"),
        (col("__best.ns").cast("double") /
          (col("n_days").cast("double") * lit(100.0)))
          .as("cusum_stat"))
      .orderBy(groupCol)
  }

  /** Exponentially time-decayed counts — the freshness-weighted
    * popularity feature (recent interactions count ~1, older ones
    * decay with the half-life): score(k) = Σ_rows 2^(−age/halfLife).
    * The standard recency prior for ranking/recommendation features,
    * as one aggregation.
    *
    * Scale shape: map-only weight computation + one key-grouped
    * map-side-combined sum + TakeOrdered top-k. Determinism: each
    * row's weight exp(−λ·age) is quantized to 1e-12 integer units
    * (libm exp differs in the last ulp across engines) and summed
    * exactly as DECIMAL(38,0)/HUGEINT.
    *
    * Output: top `k` (key, n_rows, score_fp) by (score_fp desc,
    * key), score in 1e-12 units. `lambda` exposed so the SQL oracle
    * can interpolate the identical double literal.
    */
  def lambdaFor(halfLifeDays: Double): Double =
    math.log(2.0) / halfLifeDays

  def decayedCounts(df: DataFrame, keyCol: String, ageDaysCol: String,
      halfLifeDays: Double, k: Int): DataFrame = {
    require(halfLifeDays > 0 && k >= 1, "halfLife > 0, k >= 1")
    val D = DecimalType(38, 0)
    val lam = lambdaFor(halfLifeDays)
    df.where(col(keyCol).isNotNull && col(ageDaysCol).isNotNull &&
        col(ageDaysCol) >= 0)
      .select(col(keyCol).as("key"),
        round(exp(lit(-lam) * col(ageDaysCol).cast("double")) * 1e12)
          .cast("long").as("__w"))
      .groupBy("key")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("__w").cast(D)).cast("long").as("score_fp"))
      .orderBy(col("score_fp").desc, col("key"))
      .limit(k)
  }

  /** MASE (mean absolute scaled error, Hyndman & Koehler 2006) of
    * the seasonal-naive forecast per group: the scale-free forecast
    * quality number — MASE < 1 beats the one-step naive baseline,
    * > 1 loses to it. Input follows the [[dowSeasonality]] contract:
    * (group, day, cents), metric as an exact integer.
    *
    * Both error series stay exact BIGINTs (|y_t − y_{t−m}|,
    * |y_t − y_{t−1}|; row-lag semantics — gap-fill upstream if days
    * can be missing), summed as DECIMAL(38,0); the two MAEs and
    * their ratio are the only double ops. One per-group window sort
    * + one aggregation.
    *
    * Output: (g, n_days, mae_seasonal, mae_naive, mase) ordered;
    * mase null when the naive MAE is 0 (constant series) or no
    * seasonal error is scorable.
    */
  def maseSeasonalNaive(daily: DataFrame, groupCol: String,
      dayCol: String, centsCol: String, season: Int): DataFrame = {
    require(season >= 1, "season must be >= 1")
    val D = DecimalType(38, 0)
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
    val errS = abs(col(centsCol) - lag(col(centsCol), season).over(w))
    val err1 = abs(col(centsCol) - lag(col(centsCol), 1).over(w))
    daily
      .withColumn("__es", errS).withColumn("__e1", err1)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        count(col("__es")).as("ns"),
        sum(col("__es").cast(D)).as("ss"),
        count(col("__e1")).as("n1"),
        sum(col("__e1").cast(D)).as("s1"))
      .select(col("g"), col("n_days"),
        when(col("ns") > 0, col("ss").cast("double") /
          col("ns").cast("double")).as("mae_seasonal"),
        when(col("n1") > 0, col("s1").cast("double") /
          col("n1").cast("double")).as("mae_naive"),
        when(col("ns") > 0 && col("s1") > 0,
          (col("ss").cast("double") / col("ns").cast("double")) /
            (col("s1").cast("double") / col("n1").cast("double")))
          .as("mase"))
      .orderBy("g")
  }

  /** Split-conformal coverage check of the seasonal-naive forecast:
    * the first `calibDays` scorable residuals per group set the
    * q-quantile |error| band (exact interpolated percentile — the
    * q47 Spark≡DuckDB contract); the remaining days test it. A
    * well-calibrated band covers ≈ q of test days — the
    * uncertainty-quantification audit for any downstream alerting
    * threshold.
    *
    * One per-group window for residual ranks, one percentile
    * aggregation over the calibration slice (broadcast back), one
    * test-side count. Output: (g, qhat, n_test, n_covered, coverage)
    * ordered; groups with no test rows are absent.
    */
  def conformalCoverage(daily: DataFrame, groupCol: String,
      dayCol: String, centsCol: String, season: Int, calibDays: Int,
      q: Double): DataFrame = {
    require(season >= 1 && calibDays >= 1, "season, calibDays >= 1")
    require(q > 0 && q < 1, "q in (0,1)")
    val w = Window.partitionBy(groupCol).orderBy(dayCol)
    val resid = daily
      .withColumn("__r",
        abs(col(centsCol) - lag(col(centsCol), season).over(w)))
      .where(col("__r").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(dayCol)))
    val qhat = resid.where(col("__rn") <= calibDays)
      .groupBy(col(groupCol).as("g"))
      .agg(expr(s"percentile(__r, $q)").as("qhat"))
    resid.where(col("__rn") > calibDays)
      .select(col(groupCol).as("g"), col("__r"))
      .join(qhat, Seq("g"))
      .groupBy("g")
      .agg(first(col("qhat")).as("qhat"),
        count(lit(1)).cast("long").as("n_test"),
        sum((col("__r") <= col("qhat")).cast("long")).as("n_covered"))
      .select(col("g"), col("qhat"), col("n_test"),
        col("n_covered").cast("long"),
        (col("n_covered").cast("double") /
          col("n_test").cast("double")).as("coverage"))
      .orderBy("g")
  }

  /** Mann–Kendall trend test + Theil–Sen slope per group — the
    * distribution-free answer to "is this series drifting?" that a
    * single spike cannot fake (OLS slope chases outliers; the
    * rank-sign statistic and the median pairwise slope do not).
    *
    * Input is the (group, day, cents) daily grain — so the pairwise
    * stage is O(D²) PER GROUP where D is the number of observed
    * days: calendar-bounded and independent of corpus row volume
    * (the corpus-sized work is the daily pre-aggregation the caller
    * already did). The day-pair frame comes from an equi-join on the
    * group key with a `d1 < d2` filter — never a cartesian product.
    *
    * Determinism: the sign statistic S and the tie-correction term
    * Σtⱼ(tⱼ−1)(2tⱼ+5) are exact integer sums over cent values;
    * Var(S) = (n(n−1)(2n+5) − ΣtT)/18 and the continuity-corrected
    * z are one fixed double sequence from those integers. The
    * Theil–Sen slope is a pure ORDER statistic: each pair slope is
    * one row-local double chain, the median is selected by rank
    * (row k₁ = ⌊(m+1)/2⌋, k₂ = ⌊(m+2)/2⌋) and averaged — addition
    * of two doubles is commutative, so tie order cannot change the
    * result, and no double is ever accumulated across rows.
    *
    * Output: (g, n_days, n_pairs, s, var_s, z, sen_slope) ordered by
    * group; z is null when Var(S) ≤ 0 (single-day groups), slope in
    * metric units (cents/100) per day.
    */
  def mannKendall(daily: DataFrame, groupCol: String, dayCol: String,
      centsCol: String): DataFrame = {
    val base = daily.select(col(groupCol).as("g"),
      col(dayCol).as("d"), col(centsCol).as("y"))
    val pairs = base.select(col("g"), col("d").as("d1"), col("y").as("y1"))
      .join(base.select(col("g"), col("d").as("d2"), col("y").as("y2")),
        Seq("g"))
      .where(col("d1") < col("d2"))
      .select(col("g"),
        when(col("y2") > col("y1"), 1L)
          .when(col("y2") < col("y1"), -1L).otherwise(0L).as("sgn"),
        (((col("y2") - col("y1")).cast("double") / lit(100.0)) /
          datediff(col("d2"), col("d1")).cast("double")).as("slope"))
    val sAgg = pairs.groupBy("g")
      .agg(sum("sgn").as("s"), count(lit(1)).as("n_pairs"))
    val nDays = base.groupBy("g").agg(count(lit(1)).as("n"))
    val tieT = base.groupBy("g", "y").agg(count(lit(1)).as("t"))
      .groupBy("g")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .as("tt"))
    val wRank = Window.partitionBy("g").orderBy("slope")
    val wCnt = Window.partitionBy("g")
    val sen = pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wCnt))
      // Integer-safe middle ranks: Column `/` on integers is DOUBLE
      // division, so for even m `(m+1)/2` = x.5 matched no row_number
      // and only the upper-middle slope survived — a silent bias for
      // half of all group sizes. floor() keeps both middle ranks.
      .where(col("rn") === floor((col("m") + 1) / 2).cast("long") ||
        col("rn") === floor((col("m") + 2) / 2).cast("long"))
      .groupBy("g")
      .agg((sum("slope") / count(lit(1))).as("sen_slope"))
    val vnum = col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
      col("tt")
    val varS = vnum.cast("double") / lit(18.0)
    nDays.join(tieT, Seq("g")).join(sAgg, Seq("g"))
      .join(sen, Seq("g"))
      .select(col("g"), col("n").cast("long").as("n_days"),
        col("n_pairs").cast("long"), col("s").cast("long").as("s"),
        varS.as("var_s"),
        when(varS <= 0, lit(null).cast("double"))
          .when(col("s") > 0,
            (col("s") - 1).cast("double") / sqrt(varS))
          .when(col("s") < 0,
            (col("s") + 1).cast("double") / sqrt(varS))
          .otherwise(lit(0.0)).as("z"),
        col("sen_slope"))
      .orderBy("g")
  }

  /** EWMA of an ordered window list: `EWMA_t = αx_t + (1-α)EWMA_{t-1}`
    * seeded with the first element, computed as an explicit left fold
    * (`aggregate`) so the op sequence is the identical IEEE chain in
    * Spark and a `list_reduce` SQL mirror — no pow/exp, so raw doubles
    * hash-match across engines with no quantization. Null for an
    * empty/null list. */
  def ewmaFold(vals: Column, alpha: Double): Column =
    aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      try_element_at(vals, lit(1)),
      (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc)
}
