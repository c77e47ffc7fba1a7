package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-level cleaners (SURVEY §2.2 F3–F5) and warehouse projections
  * (§2.4 W2–W4): whole-record composition of the scalar cleaners in
  * [[CleanFunctions]], matching `etl/transform/cleaners.py:207-373`
  * and `etl/transform/transformers.py:14-75` column-for-column.
  */
object RecordCleaners {

  /** Valid USDA texture labels (`cleaners.py:239-241`). */
  val validTextures: Seq[String] = Seq("Sand", "Sandy Loam", "Loam",
    "Silt Loam", "Silt", "Clay Loam", "Silty Clay Loam",
    "Sandy Clay Loam", "Sandy Clay", "Silty Clay", "Clay")

  /** F3 — clean a parsed SoilData frame (`clean_soil_data`,
    * `cleaners.py:207-251`): invalid coordinates are split to a
    * quarantine frame (the reference raises); percentages/pH/numerics
    * cleaned; texture kept when valid, else re-inferred from the
    * *cleaned* normalized contents. Returns (clean, quarantine).
    */
  def cleanSoilData(df: DataFrame): (DataFrame, DataFrame) = {
    val ok = CleanFunctions.validCoords(col("latitude"), col("longitude"))
    val clay = CleanFunctions.cleanPercentage(col("clay_0_5cm"))
    val sand = CleanFunctions.cleanPercentage(col("sand_0_5cm"))
    val silt = CleanFunctions.cleanPercentage(col("silt_0_5cm"))
    val cleaned = df.filter(ok).select(
      CleanFunctions.normalizeCoord(col("latitude")).as("latitude"),
      CleanFunctions.normalizeCoord(col("longitude")).as("longitude"),
      clay.as("clay_content"), sand.as("sand_content"),
      silt.as("silt_content"),
      CleanFunctions.cleanPh(col("ph_0_5cm")).as("ph_level"),
      CleanFunctions.cleanNumeric(col("organic_carbon_0_5cm"))
        .as("organic_carbon"),
      CleanFunctions.cleanNumeric(col("bulk_density_0_5cm"))
        .as("bulk_density"),
      CleanFunctions.cleanNumeric(col("water_capacity_0_5cm"))
        .as("water_capacity"),
      when(col("texture").isin(validTextures: _*), col("texture"))
        .otherwise(CleanFunctions.inferTexture(clay, sand, silt))
        .as("texture"),
      col("extraction_timestamp"))
    val quarantine = df.filter(!coalesce(ok, lit(false)))
      .withColumn("error", format_string("Invalid coordinates: (%s, %s)",
        col("latitude"), col("longitude")))
    (cleaned, quarantine)
  }

  /** F4 — clean a parsed WeatherData frame (`clean_weather_data`,
    * `cleaners.py:253-305`): date parse, temperature cleaning (°F
    * heuristic + range gate) *then* max/min swap repair, non-negative
    * precip/solar/wind, humidity clamped to [0,100].
    */
  def cleanWeatherData(df: DataFrame): DataFrame = {
    val tMax = CleanFunctions.cleanTemperature(col("temp_max"))
    val tMin = CleanFunctions.cleanTemperature(col("temp_min"))
    // NB guard the sanitized value too: greatest() skips nulls, so
    // NaN/Inf (cleanNumeric → null) must not turn into a fabricated 0.0
    def nonNeg(c: Column): Column = {
      val cleaned = CleanFunctions.cleanNumeric(c)
      when(c.isNull || cleaned.isNull, lit(null))
        .otherwise(greatest(lit(0d), cleaned))
    }
    df.select(
      col("latitude"), col("longitude"),
      date_format(try_to_date(col("date")), "yyyy-MM-dd").as("date"),
      CleanFunctions.repairedMax(tMax, tMin).as("temp_max"),
      CleanFunctions.repairedMin(tMax, tMin).as("temp_min"),
      CleanFunctions.cleanTemperature(col("temp_mean")).as("temp_mean"),
      nonNeg(col("precipitation")).as("precipitation"),
      CleanFunctions.cleanNumeric(col("evapotranspiration"))
        .as("evapotranspiration"),
      nonNeg(col("solar_radiation")).as("solar_radiation"),
      CleanFunctions.clamp(CleanFunctions.cleanNumeric(col("humidity")),
        0, 100).as("humidity"),
      nonNeg(col("wind_speed")).as("wind_speed"),
      col("weather_code"))
  }

  /** F5 — clean extracted crop requirements (`clean_crop_requirements`,
    * `cleaners.py:307-373`): standardized name, ordered temp/pH pairs,
    * range gates, water unit normalization, sunlight and confidence
    * clamps.
    */
  def cleanCropRequirements(df: DataFrame,
      passthrough: Seq[String] = Nil): DataFrame = {
    val tMin = col("temp_min_c")
    val tMax = col("temp_max_c")
    val tBoth = tMin.isNotNull && tMax.isNotNull
    val tLo = least(tMin, tMax)
    val tHi = greatest(tMin, tMax)
    // both must be in the temperature_c VALID_RANGE (-50, 60); either
    // out ⇒ both nulled; a lone value passes through un-gated
    val tOk = tLo.between(-50, 60) && tHi.between(-50, 60)
    val pMin = col("ph_min")
    val pMax = col("ph_max")
    val pBoth = pMin.isNotNull && pMax.isNotNull
    df.select(Seq(
      CleanFunctions.standardizeCropName(col("crop_name")).as("crop_name"),
      when(tBoth, when(tOk, bround(tLo, 1))).otherwise(tMin)
        .as("temp_min_c"),
      when(tBoth, when(tOk, bround(tHi, 1))).otherwise(tMax)
        .as("temp_max_c"),
      CleanFunctions.normalizeWater(col("water_mm_day")).as("water_mm_day"),
      CleanFunctions.clamp(col("sunlight_hours"), 0, 24)
        .as("sunlight_hours"),
      when(pBoth, CleanFunctions.clamp(least(pMin, pMax), 0, 14))
        .otherwise(pMin).as("ph_min"),
      when(pBoth, CleanFunctions.clamp(greatest(pMin, pMax), 0, 14))
        .otherwise(pMax).as("ph_max"),
      CleanFunctions.clamp(col("confidence_score"), 0, 1)
        .as("confidence_score")) ++ passthrough.map(col): _*)
  }

  /** W2 — soil dimension projection (`transform_soil`,
    * `transformers.py:14-37`). */
  def transformSoil(cleaned: DataFrame, locationKey: Column,
      extractionDate: Column): DataFrame =
    cleaned.select(
      locationKey.as("location_key"),
      col("texture").as("soil_texture"),
      col("clay_content").as("clay_content_0_5cm"),
      col("sand_content").as("sand_content_0_5cm"),
      col("silt_content").as("silt_content_0_5cm"),
      col("ph_level").as("ph_level_0_5cm"),
      col("organic_carbon").as("organic_carbon_0_5cm"),
      col("bulk_density").as("bulk_density_0_5cm"),
      col("water_capacity").as("water_capacity_0_5cm"),
      lit(5).as("soil_depth_cm"),
      extractionDate.as("extraction_date"),
      to_json(struct(
        lit("SoilGrids").as("source"),
        col("extraction_timestamp").as("timestamp"),
        struct(col("latitude").as("lat"), col("longitude").as("lon"))
          .as("coordinates"))).as("metadata"))

  /** W3 — weather fact projection (`transform_weather`,
    * `transformers.py:39-58`): `date_key` = yyyymmdd int. */
  def transformWeather(cleaned: DataFrame, locationKey: Column): DataFrame =
    cleaned.select(
      locationKey.as("location_key"),
      regexp_replace(col("date"), "-", "").cast("int").as("date_key"),
      col("latitude"), col("longitude"),
      col("temp_max").as("temp_max_c"),
      col("temp_min").as("temp_min_c"),
      col("temp_mean").as("temp_mean_c"),
      col("precipitation").as("precipitation_mm"),
      col("evapotranspiration").as("evapotranspiration_mm"),
      col("solar_radiation").as("solar_radiation_mj_m2"),
      col("humidity").as("humidity_percent"),
      col("wind_speed").as("wind_speed_ms"),
      col("weather_code"))

  /** W4 — crop dimension projection (`transform_crop_requirements`,
    * `transformers.py:60-75`): sunlight min = max (reference
    * simplification), evidence → source_urls. */
  def transformCrop(extracted: DataFrame, extractionDate: Column): DataFrame =
    extracted.select(
      col("crop_name"),
      col("temp_min_c").as("optimal_temp_min_c"),
      col("temp_max_c").as("optimal_temp_max_c"),
      col("water_mm_day").as("water_requirement_mm_day"),
      col("sunlight_hours").as("sunlight_hours_min"),
      col("sunlight_hours").as("sunlight_hours_max"),
      col("ph_min").as("soil_ph_preference_min"),
      col("ph_max").as("soil_ph_preference_max"),
      col("confidence_score").as("extraction_confidence"),
      extractionDate.as("extraction_date"),
      col("raw_evidence").as("source_urls"))
}
