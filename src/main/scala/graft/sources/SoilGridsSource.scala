package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.CleanFunctions

/** SoilGrids response source (SURVEY §2.1 S1–S3): schema'd reads of
  * captured API responses (JSON Lines, one response per row with the
  * request coordinates inlined) and the nested-layer parse
  * (`etl/extract/soil_api.py:81-116`) as pure expressions —
  * `filter` over the layers array replaces the reference's Python
  * loop, so parsing distributes with the scan.
  */
object SoilGridsSource {

  /** Properties extracted by the reference (`soil_api.py:33`). */
  val properties: Seq[String] =
    Seq("clay", "sand", "silt", "phh2o", "soc", "bdod", "wv0010")

  val schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("properties", StructType(Seq(
      StructField("layers", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("depths", ArrayType(StructType(Seq(
          StructField("range", StructType(Seq(
            StructField("top_depth", IntegerType),
            StructField("bottom_depth", IntegerType)))),
          StructField("values", StructType(Seq(
            StructField("mean", DoubleType))))))))))))))),
    StructField("timeStamp", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** `get_value(prop)` (`soil_api.py:85-93`): first layer named
    * `prop`, first depth with `top_depth == 0`, its `values.mean`. */
  def layerValue(prop: String): Column = {
    val layer = get(filter(col("properties.layers"),
      l => l.getField("name") === prop), lit(0))
    val depth = get(filter(layer.getField("depths"),
      d => d.getField("range").getField("top_depth") === 0), lit(0))
    depth.getField("values").getField("mean")
  }

  /** Python-truthiness scaling (`soil_api.py:97-98,107-108`):
    * zero or null → null, else value / 10. */
  private def scaleDiv10(c: Column): Column =
    when(c.isNull || c === 0, lit(null)).otherwise(c / 10)

  /** S2 — parse to the `SoilData` record shape: pH and SOC are stored
    * ×10 by SoilGrids, texture inferred from raw particle values. */
  def parse(raw: DataFrame): DataFrame = {
    val clay = layerValue("clay")
    val sand = layerValue("sand")
    val silt = layerValue("silt")
    raw.select(
      col("latitude"), col("longitude"),
      clay.as("clay_0_5cm"), sand.as("sand_0_5cm"), silt.as("silt_0_5cm"),
      scaleDiv10(layerValue("phh2o")).as("ph_0_5cm"),
      scaleDiv10(layerValue("soc")).as("organic_carbon_0_5cm"),
      layerValue("bdod").as("bulk_density_0_5cm"),
      layerValue("wv0010").as("water_capacity_0_5cm"),
      CleanFunctions.classifyTextureRaw(clay, sand, silt).as("texture"),
      coalesce(col("timeStamp"), lit("")).as("extraction_timestamp"))
  }

  /** S3 — extract with per-row error isolation: invalid coordinates go
    * to a quarantine frame instead of raising (`soil_api.py:150-153`).
    * Returns (parsed-good, quarantined-raw).
    */
  def extract(raw: DataFrame): (DataFrame, DataFrame) = {
    val ok = CleanFunctions.validCoords(col("latitude"), col("longitude"))
    (parse(raw.filter(ok)),
      raw.filter(!coalesce(ok, lit(false)))
        .withColumn("error", format_string(
          "Invalid coordinates: (%s, %s)", col("latitude"),
          col("longitude"))))
  }
}
