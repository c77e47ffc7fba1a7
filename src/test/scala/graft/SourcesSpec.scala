package graft

import org.apache.spark.sql.functions._
import graft.sources.{OpenMeteoSource, ScrapedTextSource, SoilGridsSource}
import graft.functions.RecordCleaners

/** Fixture-driven source tests (FIXTURES.md A1/A2; reference goldens
  * `tests/test_extractors.py`): nested SoilGrids parse with scaling
  * and truthiness quirks, Open-Meteo ragged-array zip with
  * null-padding, and the weather record cleaner over parsed rows.
  */
class SourcesSpec extends SparkSpec {

  val soilPath = "src/test/resources/fixtures/soilgrids.jsonl"
  val meteoPath = "src/test/resources/fixtures/openmeteo.jsonl"

  lazy val soil = SoilGridsSource.parse(
    SoilGridsSource.read(spark, soilPath)).orderBy("latitude").cache()

  test("S2 golden: pH 65 scales to 6.5, SOC 124 to 12.4") {
    val r = soil.filter(col("latitude") === 41.8781).collect()(0)
    assert(r.getAs[Double]("ph_0_5cm") == 6.5)
    assert(r.getAs[Double]("organic_carbon_0_5cm") == 12.4)
    assert(r.getAs[Double]("clay_0_5cm") == 25.5)
    assert(r.getAs[String]("texture") == "Loam")
  }

  test("S2 depth filter: only top_depth==0 values used") {
    val paris = soil.filter(col("latitude") === 48.8566).collect()(0)
    assert(paris.getAs[Double]("clay_0_5cm") == 30.0) // not the 99.0
    val nod0 = soil.filter(col("latitude") === 10.0).collect()(0)
    assert(nod0.isNullAt(nod0.fieldIndex("clay_0_5cm")))
  }

  test("S2 truthiness: zero pH/SOC null out (reference quirk)") {
    val syd = soil.filter(col("latitude") === -33.8688).collect()(0)
    assert(syd.isNullAt(syd.fieldIndex("ph_0_5cm")))
    assert(syd.isNullAt(syd.fieldIndex("organic_carbon_0_5cm")))
    assert(syd.isNullAt(syd.fieldIndex("texture")))
  }

  test("S3 error isolation: invalid coordinates quarantined") {
    val (good, bad) = SoilGridsSource.extract(
      SoilGridsSource.read(spark, soilPath))
    assert(good.count() == 4)
    assert(bad.count() == 1)
    assert(bad.select("error").collect()(0).getString(0)
      .contains("Invalid coordinates"))
  }

  lazy val weather = OpenMeteoSource.parse(
    OpenMeteoSource.read(spark, meteoPath)).cache()

  test("S5 zip: one row per daily.time entry") {
    assert(weather.count() == 4) // 3 + 1
  }

  test("S5 ragged arrays null-pad (reference _safe_get)") {
    val d3 = weather.filter(col("date") === "2024-01-03").collect()(0)
    assert(d3.isNullAt(d3.fieldIndex("temp_max")))   // len-2 array
    assert(d3.isNullAt(d3.fieldIndex("temp_min")))   // explicit null
    assert(d3.getAs[Double]("precipitation") == 3.0) // full-length
    val d2 = weather.filter(col("date") === "2024-01-02").collect()(0)
    assert(d2.getAs[Double]("temp_max") == 77.0)
  }

  test("F4 clean over parsed rows: °F conversion, clamp, non-negative") {
    val cleaned = RecordCleaners.cleanWeatherData(weather).cache()
    val d2 = cleaned.filter(col("date") === "2024-01-02").collect()(0)
    assert(d2.getAs[Double]("temp_max") == 25.0)      // 77°F → 25.0
    assert(d2.getAs[Double]("precipitation") == 0.0)  // -2.5 → 0
    assert(d2.getAs[Double]("humidity") == 100.0)     // 120 → 100
    assert(d2.getAs[Double]("wind_speed") == 0.0)     // -0.5 → 0
    val paris = cleaned.filter(col("latitude") === 48.8566).collect()(0)
    assert(paris.getAs[Double]("temp_max") == 10.0)   // swapped
    assert(paris.getAs[Double]("temp_min") == -5.0)
  }

  test("S5 missing metric key null-pads instead of dropping the response") {
    val p = java.nio.file.Files.createTempFile("meteo_missing", ".jsonl")
    java.nio.file.Files.writeString(p,
      """{"latitude": 1.0, "longitude": 2.0, "daily": {"time": ["2024-05-01"], "temperature_2m_max": [20.0]}}""")
    val rows = OpenMeteoSource.parse(
      OpenMeteoSource.read(spark, p.toString)).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Double]("temp_max") == 20.0)
    assert(r.isNullAt(r.fieldIndex("humidity")))    // absent key
    assert(r.isNullAt(r.fieldIndex("weather_code")))
  }

  test("F4 NaN precipitation stays null, not a fabricated 0.0") {
    import spark.implicits._
    val parsed = Seq((1.0, 2.0, "2024-01-01", Double.NaN, -1.0))
      .toDF("latitude", "longitude", "date", "precipitation",
        "wind_speed")
      .withColumn("temp_max", lit(null).cast("double"))
      .withColumn("temp_min", lit(null).cast("double"))
      .withColumn("temp_mean", lit(null).cast("double"))
      .withColumn("evapotranspiration", lit(null).cast("double"))
      .withColumn("solar_radiation", lit(null).cast("double"))
      .withColumn("humidity", lit(null).cast("double"))
      .withColumn("weather_code", lit(null).cast("int"))
    val r = RecordCleaners.cleanWeatherData(parsed).collect()(0)
    assert(r.isNullAt(r.fieldIndex("precipitation"))) // NaN → null
    assert(r.getAs[Double]("wind_speed") == 0.0)      // -1 → clamped 0
  }

  test("S7 html-to-text drops script/style and tags") {
    val html = "<html><style>p{}</style><div>Wheat <b>needs</b> " +
      "water &amp; sun.</div><script>x()</script></html>"
    assert(evalStr(html, ScrapedTextSource.htmlToText) ==
      "Wheat needs water & sun.")
  }

  test("S9 priority: highest-reliability source wins per crop") {
    import spark.implicits._
    val sources = Seq(
      ("Wheat", "fao", 0.9, "<p>fao text</p>"),
      ("Wheat", "extension", 0.7, "<p>ext text</p>"),
      ("Rice", "usda_plants", 0.85, "<p>usda</p>"))
      .toDF("crop_name", "source", "reliability", "html")
    val got = ScrapedTextSource.resolvePriority(sources)
      .select("crop_name", "source").orderBy("crop_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("Rice", "usda_plants"), ("Wheat", "fao")))
  }
}
