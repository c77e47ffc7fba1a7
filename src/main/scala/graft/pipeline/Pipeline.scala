package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CleanFunctions, NlpExtract, RecordCleaners, TextClean}
import graft.sources.{OpenMeteoSource, ScrapedTextSource, SoilGridsSource}
import graft.warehouse.{Merge, Scd2}

/** The reference's orchestrated ETL phases (SURVEY §3.1–3.2,
  * `etl/orchestrator.py`) as single declarative Spark jobs: each phase
  * is read → parse → clean → key → merge, with the hash→surrogate
  * lookup as a broadcast join (never a driver-side dict) and the
  * upserts as [[Merge.upsert]] rewrites. No driver loops anywhere —
  * at 100 TB each phase is one distributed job.
  */
object Pipeline {

  /** Location dimension maintenance shared by both phases
    * (S10/W1/J5): hash incoming coordinates, look up current dim rows,
    * insert novel ones with content-derived surrogate keys.
    */
  def upsertLocations(existingDim: DataFrame, coords: DataFrame,
      effectiveDate: Column): DataFrame = {
    val incoming = coords.select(
      CleanFunctions.normalizeCoord(col("latitude")).as("latitude"),
      CleanFunctions.normalizeCoord(col("longitude")).as("longitude"))
      .withColumn("location_hash",
        CleanFunctions.locationHash(col("latitude"), col("longitude")))
    Scd2.lookupOrInsert(existingDim, incoming, "location_hash",
      "location_key", effectiveDate)
  }

  /** The reference's partial-update column set for the weather fact
    * (`postgres_loader.py:118-123`). */
  val weatherUpdateCols: Seq[String] =
    Seq("temp_max_c", "temp_min_c", "temp_mean_c", "precipitation_mm")

  /** Weather transform chain shared by the full-merge and incremental
    * forms (SURVEY §3.2): captured Open-Meteo JSON → zip to rows → F4
    * clean → location join on hash → W3 date_key projection. Returns
    * (updated dim, keyed fact batch).
    */
  def weatherBatch(spark: SparkSession, jsonPath: String,
      existingDim: DataFrame,
      effectiveDate: Column): (DataFrame, DataFrame) = {
    val parsed = OpenMeteoSource.parse(OpenMeteoSource.read(spark, jsonPath))
    val cleaned = RecordCleaners.cleanWeatherData(parsed)
      .withColumn("location_hash",
        CleanFunctions.locationHash(
          CleanFunctions.normalizeCoord(col("latitude")),
          CleanFunctions.normalizeCoord(col("longitude"))))
    val dim = upsertLocations(existingDim,
      cleaned.select("latitude", "longitude"), effectiveDate)
    // the location dim grows with distinct coordinates — no hard
    // broadcast hint; AQE broadcasts it while it fits and degrades to a
    // shuffle join when it no longer does
    val keyed = cleaned.join(
      dim.filter(col("is_current"))
        .select("location_hash", "location_key"),
      Seq("location_hash"))
    (dim, RecordCleaners.transformWeather(keyed, col("location_key")))
  }

  /** Tiebreak over every non-key column as one struct — a total order
    * WITHIN the key group (latitude alone would tie: it is
    * functionally dependent on location_key). */
  private def weatherTiebreak(fact: DataFrame): Column =
    struct(fact.columns.filterNot(Set("date_key", "location_key",
      "part_year", "part_month")).map(col): _*).desc

  /** Weather phase: [[weatherBatch]] merged into an in-memory fact
    * keyed (date_key, location_key). */
  def runWeather(spark: SparkSession, jsonPath: String,
      existingDim: DataFrame, existingFact: DataFrame,
      effectiveDate: Column): (DataFrame, DataFrame) = {
    val (dim, fact) = weatherBatch(spark, jsonPath, existingDim,
      effectiveDate)
    val merged = Merge.upsert(existingFact, fact,
      keys = Seq("date_key", "location_key"),
      updateCols = weatherUpdateCols,
      tiebreak = Seq(weatherTiebreak(fact)))
    (dim, merged)
  }

  /** Adds the monthly partition columns the lake fact is laid out by. */
  def withMonthParts(fact: DataFrame): DataFrame =
    fact.withColumn("part_year", (col("date_key") / 10000).cast("int"))
      .withColumn("part_month", (col("date_key") / 100 % 100).cast("int"))

  /** Merge a (part_year, part_month)-augmented weather batch into the
    * path-backed monthly-partitioned fact: only the partitions the
    * batch touches are read and rewritten
    * ([[Merge.upsertPartitioned]]) — the reference's monthly
    * RANGE-partition intent (`db/init/01-schema.sql:160-181`)
    * composed end-to-end. */
  def weatherMerge(spark: SparkSession, factPath: String,
      batch: DataFrame): Unit =
    Merge.upsertPartitioned(spark, factPath, batch,
      keys = Seq("date_key", "location_key"),
      updateCols = weatherUpdateCols,
      tiebreak = Seq(weatherTiebreak(batch)),
      partitionCols = Seq("part_year", "part_month"))

  /** Weather phase, incremental lake form: [[weatherBatch]] →
    * [[withMonthParts]] → [[weatherMerge]]. Returns the updated
    * location dimension; the fact table on storage is the merge
    * target. Callers needing a durable dim-before-fact commit order
    * should stage the batch and promote the dim before merging (see
    * `PipelineMain`). */
  def runWeatherIncremental(spark: SparkSession, jsonPath: String,
      existingDim: DataFrame, factPath: String,
      effectiveDate: Column): DataFrame = {
    val (dim, fact) = weatherBatch(spark, jsonPath, existingDim,
      effectiveDate)
    weatherMerge(spark, factPath, withMonthParts(fact))
    dim
  }

  /** Soil phase (SURVEY §3.1): captured SoilGrids JSON → nested parse
    * (with coordinate quarantine) → F3 clean → location join → W2
    * projection → merge keyed (location_key, extraction_date) updating
    * texture/pH/metadata only.
    */
  def runSoil(spark: SparkSession, jsonPath: String,
      existingDim: DataFrame, existingSoil: DataFrame,
      extractionDate: Column): (DataFrame, DataFrame, DataFrame) = {
    val (parsed, quarantine) =
      SoilGridsSource.extract(SoilGridsSource.read(spark, jsonPath))
    val (cleaned, _) = RecordCleaners.cleanSoilData(parsed)
    val hashed = cleaned.withColumn("location_hash",
      CleanFunctions.locationHash(col("latitude"), col("longitude")))
    val dim = upsertLocations(existingDim,
      hashed.select("latitude", "longitude"), extractionDate)
    // location dim grows with distinct coordinates — AQE-gated join
    // strategy, no hard broadcast hint (see runWeather)
    val keyed = hashed.join(
      dim.filter(col("is_current"))
        .select("location_hash", "location_key"),
      Seq("location_hash"))
    val soilDim = RecordCleaners.transformSoil(keyed, col("location_key"),
      extractionDate)
    val soilOrder = struct(soilDim.columns
      .filterNot(Set("location_key", "extraction_date")).map(col): _*)
      .desc
    val merged = Merge.upsert(existingSoil, soilDim,
      keys = Seq("location_key", "extraction_date"),
      updateCols = Seq("soil_texture", "ph_level_0_5cm", "metadata"),
      tiebreak = Seq(soilOrder))
    (dim, merged, quarantine)
  }

  /** Crop phase (SURVEY §3.1): scraped (crop_name, html, source,
    * reliability) rows → priority resolution → HTML-to-text → T11–T16
    * extraction → F5 clean → W4 projection → merge keyed crop_name
    * with the reference's partial-update column set
    * (`postgres_loader.py:154-159`).
    */
  def runCrop(scraped: DataFrame, existingCrop: DataFrame,
      extractionDate: Column): DataFrame = {
    val texts = ScrapedTextSource.resolvePriority(
      scraped.withColumn("raw_text",
        ScrapedTextSource.htmlToText(col("html"))))
    // generator barrier: materialize the extraction struct once per row
    // before fanning out to fields (see NlpExtract.extractRequirements)
    val extracted = texts.select(col("crop_name"),
        explode(array(NlpExtract.extractRequirements(col("raw_text"))))
          .as("e"))
      .select(col("crop_name"),
        col("e.temp_min_c").as("temp_min_c"),
        col("e.temp_max_c").as("temp_max_c"),
        col("e.water_mm_day").as("water_mm_day"),
        col("e.sunlight_hours").as("sunlight_hours"),
        col("e.ph_min").as("ph_min"),
        col("e.ph_max").as("ph_max"),
        col("e.confidence_score").as("confidence_score"),
        col("e.raw_evidence").as("raw_evidence"))
    val cleaned = RecordCleaners.cleanCropRequirements(extracted,
      passthrough = Seq("raw_evidence"))
    val cropDim = RecordCleaners.transformCrop(cleaned, extractionDate)
    val cropOrder = struct(cropDim.columns
      .filterNot(_ == "crop_name").filterNot(_ == "source_urls")
      .map(col): _*).desc
    Merge.upsert(existingCrop, cropDim, keys = Seq("crop_name"),
      updateCols = Seq("optimal_temp_min_c", "optimal_temp_max_c",
        "water_requirement_mm_day", "extraction_confidence",
        "extraction_date"),
      tiebreak = Seq(col("extraction_confidence").desc, cropOrder))
  }
}
