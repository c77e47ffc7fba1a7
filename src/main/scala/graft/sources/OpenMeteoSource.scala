package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Open-Meteo archive source (SURVEY §2.1 S4–S6): schema'd reads of
  * captured responses and the columnar→row zip
  * (`etl/extract/weather_api.py:95-125`) via `arrays_zip` + bounded
  * `posexplode` — exactly the reference's semantics: one row per
  * `daily.time` entry, every other metric null-padded when its array
  * is shorter or missing (`_safe_get`).
  */
object OpenMeteoSource {

  /** The nine daily metrics requested by the reference
    * (`weather_api.py:66-76`) with their record-field names. */
  val metrics: Seq[(String, String)] = Seq(
    "temperature_2m_max" -> "temp_max",
    "temperature_2m_min" -> "temp_min",
    "temperature_2m_mean" -> "temp_mean",
    "precipitation_sum" -> "precipitation",
    "et0_fao_evapotranspiration" -> "evapotranspiration",
    "shortwave_radiation_sum" -> "solar_radiation",
    "relative_humidity_2m_mean" -> "humidity",
    "wind_speed_10m_max" -> "wind_speed")

  val schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("daily", StructType(
      StructField("time", ArrayType(StringType)) +:
        metrics.map { case (api, _) =>
          StructField(api, ArrayType(DoubleType))
        } :+ StructField("weather_code", ArrayType(IntegerType))))))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 — zip the parallel daily arrays into rows. The zip is bounded
    * by `len(daily.time)` (the reference iterates time only), while
    * shorter/missing arrays null-pad. A metric that is absent from the
    * response entirely reads as a NULL array — it must be coalesced to
    * an empty array first, because `arrays_zip` of any null input is
    * null (which would silently drop the whole response instead of
    * null-padding like the reference's `_safe_get`).
    */
  def parse(raw: DataFrame): DataFrame = {
    def arr(c: Column, tpe: String): Column =
      coalesce(c, array().cast(s"array<$tpe>"))
    val zipped = arrays_zip(
      arr(col("daily.time"), "string").as("date") +:
        metrics.map { case (api, rec) =>
          arr(col(s"daily.$api"), "double").as(rec)
        } :+
        arr(col("daily.weather_code"), "int").as("weather_code"): _*)
    raw.select(col("latitude"), col("longitude"),
        size(col("daily.time")).as("__n"),
        posexplode(zipped).as(Seq("pos", "z")))
      .filter(col("pos") < col("__n"))
      .select(Seq(col("latitude"), col("longitude"),
        col("z.date").as("date")) ++
        metrics.map { case (_, rec) => col(s"z.$rec").as(rec) } :+
        col("z.weather_code").as("weather_code"): _*)
  }
}
