package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Pipeline

/** End-to-end reference-shaped slices (SURVEY §3.1–3.2): weather
  * fixture JSON → zip → clean → location join → date_key → merge; soil
  * fixture → parse → clean → merge; crop HTML → priority → extract →
  * clean → merge.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  def emptyDim: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("location_hash", StringType),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("location_key", LongType),
      StructField("effective_date", StringType),
      StructField("is_current", BooleanType))))

  test("weather phase: fixture to keyed, merged fact") {
    val factSchema = StructType(Seq(
      StructField("location_key", LongType),
      StructField("date_key", IntegerType),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("temp_max_c", DoubleType),
      StructField("temp_min_c", DoubleType),
      StructField("temp_mean_c", DoubleType),
      StructField("precipitation_mm", DoubleType),
      StructField("evapotranspiration_mm", DoubleType),
      StructField("solar_radiation_mj_m2", DoubleType),
      StructField("humidity_percent", DoubleType),
      StructField("wind_speed_ms", DoubleType),
      StructField("weather_code", IntegerType)))
    val emptyFact = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], factSchema)

    val (dim, fact) = Pipeline.runWeather(spark,
      "src/test/resources/fixtures/openmeteo.jsonl",
      emptyDim.drop("location_key")
        .withColumn("location_key", lit(0L)),
      emptyFact, lit("2026-01-01"))
    val f = fact.cache()
    assert(dim.count() == 2)          // two distinct coordinates
    assert(f.count() == 4)            // 3 + 1 daily rows
    val r = f.filter(col("date_key") === 20240102).collect()(0)
    assert(r.getAs[Double]("temp_max_c") == 25.0)  // 77°F cleaned
    assert(!r.isNullAt(r.fieldIndex("location_key")))

    // idempotent re-run: merging the same batch changes nothing
    val (_, fact2) = Pipeline.runWeather(spark,
      "src/test/resources/fixtures/openmeteo.jsonl",
      dim, f, lit("2026-02-01"))
    assert(fact2.count() == 4)
    assert(fact2.exceptAll(f).count() == 0)
  }

  test("incremental weather phase merges into a partitioned lake fact") {
    val factPath = tmpDir("graft_pipe_fact") + "/fact_weather"
    val dim = Pipeline.runWeatherIncremental(spark,
      "src/test/resources/fixtures/openmeteo.jsonl",
      emptyDim.drop("location_key").withColumn("location_key", lit(0L)),
      factPath, lit("2026-01-01"))
    assert(dim.count() == 2)
    val fact = spark.read.parquet(factPath)
    assert(fact.count() == 4)
    // monthly partition layout exists
    assert(new java.io.File(s"$factPath/part_year=2024").exists())
    // idempotent re-run: same batch merges to the same CONTENT —
    // snapshot the first run before re-merging (comparing the live
    // table to itself would be a tautology)
    val before = fact.collect().toSeq
    Pipeline.runWeatherIncremental(spark,
      "src/test/resources/fixtures/openmeteo.jsonl",
      dim.drop("is_new"), factPath, lit("2026-02-01"))
    spark.catalog.refreshByPath(factPath)
    val cols = fact.columns.sorted
    def shape(rows: Seq[org.apache.spark.sql.Row],
        schema: org.apache.spark.sql.types.StructType) =
      rows.map(r => cols.map(c => r.get(schema.fieldIndex(c))).toSeq)
        .sortBy(_.mkString("|"))
    val again = spark.read.parquet(factPath)
    assert(shape(again.collect().toSeq, again.schema) ==
      shape(before, fact.schema))
  }

  test("soil phase: fixture to merged soil dimension with quarantine") {
    val soilSchema = StructType(Seq(
      StructField("location_key", LongType),
      StructField("soil_texture", StringType),
      StructField("clay_content_0_5cm", DoubleType),
      StructField("sand_content_0_5cm", DoubleType),
      StructField("silt_content_0_5cm", DoubleType),
      StructField("ph_level_0_5cm", DoubleType),
      StructField("organic_carbon_0_5cm", DoubleType),
      StructField("bulk_density_0_5cm", DoubleType),
      StructField("water_capacity_0_5cm", DoubleType),
      StructField("soil_depth_cm", IntegerType),
      StructField("extraction_date", StringType),
      StructField("metadata", StringType)))
    val emptySoil = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], soilSchema)

    val (dim, soilDim, quarantine) = Pipeline.runSoil(spark,
      "src/test/resources/fixtures/soilgrids.jsonl",
      emptyDim, emptySoil, lit("2026-01-15"))
    assert(quarantine.count() == 1)   // lat 95 invalid
    assert(soilDim.count() == 4)
    val chi = soilDim.filter(col("ph_level_0_5cm") === 6.5)
    assert(chi.count() == 1)
    assert(chi.collect()(0).getAs[String]("metadata")
      .contains("\"source\":\"SoilGrids\""))
  }

  test("crop phase: scraped html to merged crop dimension") {
    val scraped = Seq(
      ("wheat", "fao", 0.9,
        "<div>Optimal temperatures between 20°C and 25°C. Requires " +
          "6 mm of water. Full sun exposure of 9 hours of sunlight. " +
          "Soil pH 6.0 to 7.0 preferred.</div>"),
      ("wheat", "extension", 0.7, "<div>irrelevant</div>"),
      ("corn", "usda_plants", 0.85,
        "<div>Grows between 18°C - 30°C with 5 mm per day water. " +
          "Needs partial shade.</div>"))
      .toDF("crop_name", "source", "reliability", "html")
    val emptyCrop = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("crop_name", StringType),
        StructField("optimal_temp_min_c", DoubleType),
        StructField("optimal_temp_max_c", DoubleType),
        StructField("water_requirement_mm_day", DoubleType),
        StructField("sunlight_hours_min", DoubleType),
        StructField("sunlight_hours_max", DoubleType),
        StructField("soil_ph_preference_min", DoubleType),
        StructField("soil_ph_preference_max", DoubleType),
        StructField("extraction_confidence", DoubleType),
        StructField("extraction_date", StringType),
        StructField("source_urls", ArrayType(StringType)))))

    val out = Pipeline.runCrop(scraped, emptyCrop, lit("2026-01-20"))
      .orderBy("crop_name").cache()
    assert(out.count() == 2)
    val wheat = out.filter(col("crop_name") === "Wheat").collect()(0)
    assert(wheat.getAs[Double]("optimal_temp_min_c") == 20.0)
    assert(wheat.getAs[Double]("optimal_temp_max_c") == 25.0)
    assert(wheat.getAs[Double]("soil_ph_preference_min") == 6.0)
    assert(wheat.getAs[Double]("extraction_confidence") > 0.5)
    val corn = out.filter(col("crop_name") === "Maize").collect()(0)
    assert(corn.getAs[Double]("optimal_temp_min_c") == 18.0)
    assert(corn.getAs[Double]("sunlight_hours_min") == 3.0) // shade
  }
}
