package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytical endpoints (SURVEY §7 "analytics"):
  * `mv_location_crop_compatibility` (J1 + J2 + CASE,
  * `db/init/01-schema.sql:254-272`) and the crop-suitability scoring
  * job for the declared-but-never-computed `fact_crop_suitability`
  * (`db/init/01-schema.sql:203-217`): temperature / water / pH match
  * scores with a limiting factor and recommendation.
  *
  * Scale posture: the location⋈soil join is keyed; the crop side of
  * the cross join is dimension-sized and broadcast; weather aggregates
  * are reduced BEFORE joining (partial aggregation on the fact, join
  * after), so the big table is scanned once and never fanned out.
  */
object Suitability {

  /** The materialized-view job: location ⋈ soil × crop with the pH
    * compatibility CASE. `refresh` = rerun and overwrite the output
    * table. */
  def compatibilityMatrix(location: DataFrame, soil: DataFrame,
      crop: DataFrame): DataFrame =
    location.filter(col("is_current"))
      .join(soil, Seq("location_key"))
      .crossJoin(broadcast(crop))
      .select(col("location_key"), col("latitude"), col("longitude"),
        col("crop_name"), col("optimal_temp_min_c"),
        col("optimal_temp_max_c"), col("ph_level_0_5cm"),
        when(col("ph_level_0_5cm").between(
          col("soil_ph_preference_min"), col("soil_ph_preference_max")),
          "Compatible").otherwise("Incompatible").as("ph_compatibility"))

  /** Temperature match: 1 − capped distance of the observed mean from
    * the crop's optimal band center, scaled by 20 °C. */
  def tempMatch(tempAvg: Column, tMin: Column, tMax: Column): Column =
    lit(1.0) - least(lit(1.0),
      abs(tempAvg - (tMin + tMax) / 2.0) / 20.0)

  /** Water adequacy: available / required, capped at 1. */
  def waterAdequacy(avail: Column, required: Column): Column =
    least(lit(1.0), avail / required)

  /** pH match: 1 inside the preference band, else 1 − capped distance
    * to the nearest bound (half-unit scale). */
  def phMatch(ph: Column, lo: Column, hi: Column): Column =
    when(ph.between(lo, hi), lit(1.0))
      .otherwise(lit(1.0) - least(lit(1.0),
        greatest(lo - ph, ph - hi) / 2.0))

  /** The scoring job: per (location, crop), weighted overall score,
    * limiting factor (lowest component), recommendation tier.
    * `weather` must already be aggregated to per-location
    * (temp_avg_c, water_avail_mm) — reduce before join.
    */
  def score(location: DataFrame, soil: DataFrame, crop: DataFrame,
      weatherAgg: DataFrame, analysisDate: Column): DataFrame = {
    val t = tempMatch(col("temp_avg_c"),
      col("optimal_temp_min_c"), col("optimal_temp_max_c"))
    val w = waterAdequacy(col("water_avail_mm"),
      col("water_requirement_mm_day"))
    val p = phMatch(col("ph_level_0_5cm"),
      col("soil_ph_preference_min"), col("soil_ph_preference_max"))
    val overall = t * 0.4 + w * 0.3 + p * 0.3
    val limiting = when(t <= w && t <= p, "temperature")
      .when(w <= t && w <= p, "water")
      .otherwise("soil_ph")
    location.filter(col("is_current"))
      .join(soil, Seq("location_key"))
      .join(weatherAgg, Seq("location_key"))
      .crossJoin(broadcast(crop))
      .select(col("location_key"), col("crop_name"),
        analysisDate.as("analysis_date"),
        t.as("temp_match_score"),
        w.as("water_adequacy_score"),
        p.as("soil_ph_match_score"),
        overall.as("overall_suitability_score"),
        limiting.as("limiting_factor"),
        when(overall >= 0.8, "Highly suitable")
          .when(overall >= 0.5, "Moderately suitable")
          .otherwise("Not recommended").as("recommendation_text"))
  }
}
