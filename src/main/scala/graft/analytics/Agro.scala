package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Agro-climatic derived indicators over daily weather series — the
  * downstream analytics a user of the reference warehouse
  * (`db/init/01-schema.sql` `weather_fact`: temp_max/temp_min/
  * precipitation per location per day) computes from the star schema:
  * growing degree days, frost/heat-stress censuses, dry-spell run
  * lengths, and multi-year monthly climate normals with anomaly
  * flags. The reference stops at storing the cleaned facts; these are
  * the standard FAO-style aggregations its consumers run next.
  *
  * All inputs are fixed-point (temperature/precip in integer cents),
  * so every aggregation is an exact integer/decimal sum — the final
  * unit conversion to double is one deterministic division, and every
  * operator is hash-comparable across engines.
  *
  * Scale shape: each operator is one or two keyed aggregations over
  * the daily series (map-side combined); the dry-spell islands add one
  * window sort per location partition. Nothing joins the fact table to
  * itself; at 100 TB these run as a single pass over a
  * location-partitioned scan.
  */
object Agro {

  /** Growing degree days + stress censuses per location over a daily
    * (location, tmax_cents, tmin_cents) series.
    *
    * GDD (base b) accumulates max(0, (tmax+tmin)/2 − b) per day; to
    * stay integer-exact the DOUBLED daily value max(0, tmax_c + tmin_c
    * − 2·b_c) is summed in cents and divided by 200 once at the end.
    * Frost days count tmin below `frostBelowCents`, heat-stress days
    * tmax above `heatAboveCents` (FAO convention: strict comparisons).
    *
    * Output per location: (loc, n_days, gdd, frost_days, heat_days)
    * with gdd an exact-integer-derived double in degree-days.
    */
  def gdd(daily: DataFrame, locCol: String, tmaxCents: String,
      tminCents: String, baseCents: Long = 1000L,
      frostBelowCents: Long = 0L, heatAboveCents: Long = 3000L)
      : DataFrame =
    daily.groupBy(col(locCol).as("loc"))
      .agg(count(lit(1)).as("n_days"),
        (sum(greatest(lit(0L),
          col(tmaxCents) + col(tminCents) - lit(2 * baseCents)))
          .cast("double") / lit(200.0)).as("gdd"),
        sum(when(col(tminCents) < lit(frostBelowCents), 1L)
          .otherwise(0L)).as("frost_days"),
        sum(when(col(tmaxCents) > lit(heatAboveCents), 1L)
          .otherwise(0L)).as("heat_days"))

  /** Dry-spell (consecutive-dry-day) runs per location over a daily
    * (location, day DATE, is_dry BOOLEAN) series — the gaps-and-islands
    * pattern keyed by `day − row_number()`: a run is a maximal set of
    * CALENDAR-consecutive observed-dry days, so an unobserved day
    * breaks a run (missing ≠ dry). One window sort per location over
    * dry rows only, then one aggregation.
    *
    * Output per location: (loc, dry_days, n_runs, max_run,
    * n_spells — runs of at least `spellMinDays`). Locations with no
    * dry day are preserved with zero counts and a null max_run.
    */
  def drySpells(daily: DataFrame, locCol: String, dayCol: String,
      isDryCol: String, spellMinDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dry = daily.where(col(isDryCol))
      .select(col(locCol).as("loc"), col(dayCol).as("_day"))
    val w = Window.partitionBy("loc").orderBy("_day")
    val runs = dry
      .withColumn("_grp", date_sub(col("_day"), row_number().over(w)))
      .groupBy("loc", "_grp").agg(count(lit(1)).as("_len"))
      .groupBy("loc")
      .agg(sum(col("_len")).as("dry_days"),
        count(lit(1)).as("n_runs"), max(col("_len")).as("max_run"),
        sum(when(col("_len") >= spellMinDays, 1L).otherwise(0L))
          .as("n_spells"))
    daily.select(col(locCol).as("loc")).distinct()
      .join(runs, Seq("loc"), "left")
      .select(col("loc"), coalesce(col("dry_days"), lit(0L)).as("dry_days"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"), col("max_run"),
        coalesce(col("n_spells"), lit(0L)).as("n_spells"))
  }

  /** Cumulative water-balance deficit per location over a daily
    * (location, day, net_cents = ET₀ − precipitation) series — the
    * clamped running recurrence D_t = max(0, D_{t−1} + net_t) (a
    * reservoir that rain can empty but never over-fill), which looks
    * sequential but is the Lindley recursion, so it rewrites to pure
    * window algebra: D_t = S_t − min(0, min_{k≤t} S_k) with S the
    * running prefix sum. Two windows over ONE sort per location —
    * fully parallel across locations, no iterative fixpoint, the
    * scale-safe form of every "carry a clamped balance forward"
    * computation (inventory, queue depth, soil moisture).
    *
    * Output per location: (loc, n_days, max_deficit, final_deficit,
    * days_over — days with deficit strictly above
    * `thresholdCents`), all exact integer cents.
    */
  def waterBalance(daily: DataFrame, locCol: String, dayCol: String,
      netCents: String, thresholdCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withS = daily.select(col(locCol).as("loc"),
        col(dayCol).as("_day"), col(netCents).as("_net"))
      .withColumn("_s", sum(col("_net")).over(
        Window.partitionBy("loc").orderBy("_day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wS = Window.partitionBy("loc").orderBy("_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withS
      .withColumn("_deficit",
        col("_s") - least(lit(0L), min(col("_s")).over(wS)))
      .groupBy("loc")
      .agg(count(lit(1)).as("n_days"),
        max(col("_deficit")).as("max_deficit"),
        max(struct(col("_day"), col("_deficit")))
          .getField("_deficit").as("final_deficit"),
        sum(when(col("_deficit") > thresholdCents, 1L).otherwise(0L))
          .as("days_over"))
  }

  /** Multi-year monthly climate normals + anomaly census over a
    * monthly (location, year, month, value_cents) series: the normal
    * is the across-year mean of the month's value; a (loc, month,
    * year) observation is anomalous when it deviates from the normal
    * by more than `relThresholdPct` percent of the normal's absolute
    * value. The comparison is cross-multiplied in integers
    * (|v·n − Σ|·100 > pct·|Σ|·… with n the year count), so no
    * float boundary can disagree between engines.
    *
    * Output per (loc, month): (loc, month, n_years, normal — exact
    * Σ/n/100 double, n_anom).
    */
  def monthlyNormals(monthly: DataFrame, locCol: String, yearCol: String,
      monthCol: String, valueCents: String, relThresholdPct: Long = 50L)
      : DataFrame = {
    val stats = monthly.groupBy(col(locCol).as("loc"),
        col(monthCol).as("month"))
      .agg(count(lit(1)).as("n_years"), sum(col(valueCents)).as("_sum"))
    monthly.select(col(locCol).as("loc"), col(monthCol).as("month"),
        col(valueCents).as("_v"))
      .join(stats, Seq("loc", "month"))
      .groupBy("loc", "month")
      .agg(first(col("n_years")).as("n_years"),
        (first(col("_sum")).cast("double") /
          first(col("n_years")).cast("double") / lit(100.0)).as("normal"),
        sum(when(abs(col("_v") * col("n_years") - col("_sum")) * lit(100L)
          > lit(relThresholdPct) * abs(col("_sum")), 1L).otherwise(0L))
          .as("n_anom"))
  }

  /** Growing-season onset per (location, year): the first calendar
    * day whose cumulative growing-degree-day sum reaches
    * `thresholdDoubledCents` (the planting-date rule agronomists run
    * on the GDD series; accumulation in DOUBLED cents like [[gdd]] —
    * threshold 10000 ≡ 50 °C·day). One window sum per (loc, year)
    * ordered by day, then a conditional min — no self-join, exact
    * integers until the final `/200` render. Years that never reach
    * the threshold keep a null onset.
    *
    * Output: (loc, y, onset_day yyyy-MM-dd or null, season_gdd,
    * n_days).
    */
  def seasonOnset(daily: DataFrame, locCol: String, dayCol: String,
      tmaxCol: String, tminCol: String,
      thresholdDoubledCents: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(locCol), year(col(dayCol)))
      .orderBy(col(dayCol))
    daily
      .withColumn("_g", greatest(lit(0L),
        col(tmaxCol) + col(tminCol) - lit(2000L)))
      .withColumn("_cum", sum(col("_g")).over(w))
      .groupBy(col(locCol).as("loc"),
        year(col(dayCol)).cast("long").as("y"))
      .agg(
        date_format(min(when(col("_cum") >= thresholdDoubledCents,
          col(dayCol))), "yyyy-MM-dd").as("onset_day"),
        (max(col("_cum")).cast("double") / lit(200.0))
          .as("season_gdd"),
        count(lit(1)).as("n_days"))
  }

  /** Last spring frost per (location, year): the latest day in
    * months 1..`springEndMonth` with tmin below freezing — the
    * frost-risk date that, with [[seasonOnset]], brackets the safe
    * planting window. One keyed aggregation (conditional max +
    * count); years without a spring frost keep a null date.
    *
    * Output: (loc, y, last_frost yyyy-MM-dd or null, n_frost_days).
    */
  def lastSpringFrost(daily: DataFrame, locCol: String, dayCol: String,
      tminCol: String, springEndMonth: Int = 6): DataFrame = {
    require(springEndMonth >= 1 && springEndMonth <= 12,
      s"springEndMonth must be in [1, 12], got $springEndMonth")
    val frost = month(col(dayCol)) <= springEndMonth &&
      col(tminCol) < 0L
    daily.groupBy(col(locCol).as("loc"),
        year(col(dayCol)).cast("long").as("y"))
      .agg(
        date_format(max(when(frost, col(dayCol))), "yyyy-MM-dd")
          .as("last_frost"),
        sum(when(frost, 1L).otherwise(0L)).as("n_frost_days"))
  }

  /** Frost-free season per (location, year): last spring frost
    * (months 1..`splitMonth`), first autumn frost (months
    * `splitMonth`+1..12), and the day count strictly between them —
    * the growing-window metric that, with [[seasonOnset]], drives
    * planting calendars. One keyed aggregation (two conditional
    * extremes + one datediff); years missing either frost keep null
    * season_days (an OPEN window, not zero).
    *
    * Output: (loc, y, last_spring_frost, first_autumn_frost — both
    * yyyy-MM-dd or null, season_days BIGINT or null).
    */
  def frostFreeSeason(daily: DataFrame, locCol: String, dayCol: String,
      tminCol: String, splitMonth: Int = 6): DataFrame = {
    require(splitMonth >= 1 && splitMonth <= 11,
      s"splitMonth must be in [1, 11], got $splitMonth")
    val frost = col(tminCol) < 0L
    val spring = frost && month(col(dayCol)) <= splitMonth
    val autumn = frost && month(col(dayCol)) > splitMonth
    daily.groupBy(col(locCol).as("loc"),
        year(col(dayCol)).cast("long").as("y"))
      .agg(
        max(when(spring, col(dayCol))).as("_ls"),
        min(when(autumn, col(dayCol))).as("_fa"))
      .select(col("loc"), col("y"),
        date_format(col("_ls"), "yyyy-MM-dd").as("last_spring_frost"),
        date_format(col("_fa"), "yyyy-MM-dd").as("first_autumn_frost"),
        (datediff(col("_fa"), col("_ls")) - lit(1))
          .cast("long").as("season_days"))
  }

  /** Standardized monthly anomaly (the SPI-family z-score on the
    * calendar-month climatology): for each (location, year, month),
    * `z = (v − mean_month) / sd_month` with the population sd over
    * that location's same-calendar-month history. Determinism: the
    * whole statistic reduces to ONE double division of exact
    * integers — `z = (n·v − S) / sqrt(n·Q − S²)` with S = Σv,
    * Q = Σv² accumulated as exact DECIMAL(38,0) cents (Q overflows
    * BIGINT at warehouse scale) — so the doubles are bit-identical
    * across engines and partitionings. Zero-variance months (every
    * year identical) yield null z. Two cheap month-keyed
    * aggregations; nothing wider than (loc, month) ever shuffles.
    *
    * Output: (loc, y, month, v_cents, n_years, z) — one row per
    * input observation.
    */
  def monthlyZScores(monthly: DataFrame, locCol: String,
      yearCol: String, monthCol: String, valueCents: String)
      : DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stats = monthly.groupBy(col(locCol).as("loc"),
        col(monthCol).as("month"))
      .agg(count(lit(1)).as("n_years"),
        sum(col(valueCents).cast(d38)).as("_s"),
        sum((col(valueCents).cast(d38) * col(valueCents).cast(d38)))
          .as("_q"))
    monthly.select(col(locCol).as("loc"), col(yearCol).as("y"),
        col(monthCol).as("month"), col(valueCents).as("v_cents"))
      .join(stats, Seq("loc", "month"))
      .select(col("loc"), col("y"), col("month"), col("v_cents"),
        col("n_years"),
        when(col("n_years") * col("_q") - col("_s") * col("_s") >
            lit(0),
          (col("n_years") * col("v_cents").cast(d38) - col("_s"))
            .cast("double") /
            sqrt((col("n_years") * col("_q") - col("_s") * col("_s"))
              .cast("double"))).as("z"))
  }
}
