package graft

import org.apache.spark.sql.functions._
import graft.pipeline.GeoPipeline

class GeoPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("buildMart: enriched snapshot committed, schema + values right") {
    val fields = Seq((1L, 0L, 0L), (2L, 80000000L, 0L))
      .toDF("pid", "plat", "plon")
    val stations = Seq(
      (10L, 1000000L, 0L, 700L), (11L, 2000000L, 0L, 300L))
      .toDF("sid", "slat", "slon", "vc")
    val path = tmpDir("geomart") + "/t"
    val v = GeoPipeline.buildMart(spark, fields, "pid", "plat", "plon",
      stations, "sid", "slat", "slon", col("vc"), path)
    assert(v === 1L)
    val mart = graft.warehouse.Versioned.read(spark, path, Some(v))
    assert(mart.columns.toSeq === Seq("pid", "lat", "lon", "cell_lat",
      "cell_lon", "station", "station_d2", "n_cand", "idw_n",
      "idw_est"))
    val got = mart.orderBy("pid")
      .select("pid", "station", "n_cand", "idw_n", "idw_est")
      .as[(Long, Option[Long], Long, Long, Option[Double])]
      .collect().toSeq
    // point 1: nearest = station 10 (1° vs 2°), IDW over both;
    // point 2 at lat 80° has an empty ring → null enrichment
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ===
      Seq((1L, Some(10L), 2L, 2L), (2L, None, 0L, 0L)))
    val est = got.head._5.get
    assert(est > 3.0 && est < 7.0) // between the two station values
    // a rebuild REPLACES the mart; the old build stays readable
    val v2 = GeoPipeline.buildMart(spark, fields, "pid", "plat",
      "plon", stations, "sid", "slat", "slon", col("vc"), path)
    assert(v2 === 2L)
    assert(graft.warehouse.Versioned.read(spark, path, Some(2L))
      .count() === 2L)
    assert(graft.warehouse.Versioned.read(spark, path, Some(1L))
      .count() === 2L)
  }
}
