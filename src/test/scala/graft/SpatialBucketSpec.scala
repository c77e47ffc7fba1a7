package graft

import org.apache.spark.sql.functions._
import graft.analytics.Spatial

/** The co-location contract of the spatial tier: a station table
  * persisted with [[Spatial.bucketStations]] joins ring probes with
  * ONE shuffle exchange total — the probe side — because the bucketed
  * scan's hash partitioning on (cell_lat, cell_lon) already satisfies
  * the join's clustering requirement. At 100 TB the station/
  * observation side is the big one; bucketing amortizes its shuffle
  * to zero across every query that probes it. */
class SpatialBucketSpec extends SparkSpec {
  import spark.implicits._

  private val Cell = 10000000L

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("pid", "plat", "plon")

  private val stations = Seq(
    (1L, 1000000L, 1000000L), (2L, 2000000L, 0L),
    (3L, -1000000L, 0L), (4L, 0L, -179800000L),
    (5L, 45000000L, 45000000L), (6L, 45500000L, 44500000L))
    .toDF("sid", "slat", "slon")

  private val points = pts((1L, 0L, 0L), (2L, 0L, 179800000L),
    (3L, 44800000L, 44800000L), (4L, -80000000L, 0L))

  test("bucketed nearest equals inline nearest, value for value") {
    Spatial.bucketStations(stations, "sid", "slat", "slon", Cell,
      buckets = 4, table = "geo_stations_eq")
    val inline = Spatial.nearestStation(points, "pid", "plat", "plon",
      stations, "sid", "slat", "slon", Cell)
      .orderBy("pid").collect().toSeq
    val bucketed = Spatial.nearestStationBucketed(spark, points,
      "pid", "plat", "plon", "geo_stations_eq", Cell)
      .orderBy("pid").collect().toSeq
    assert(bucketed === inline)
  }

  test("bucketed IDW with payload columns equals the inline estimate") {
    val withV = stations.withColumn("vc", col("sid") * 100L)
    Spatial.bucketStations(withV, "sid", "slat", "slon", Cell,
      buckets = 4, table = "geo_stations_v", payloadCols = Seq("vc"))
    val inline = Spatial.idwEstimate(points, "pid", "plat", "plon",
      withV, "sid", "slat", "slon", col("vc"), Cell)
      .orderBy("pid").collect().toSeq
    val bucketed = Spatial.idwEstimateBucketed(spark, points, "pid",
      "plat", "plon", "geo_stations_v", Cell, col("vc"))
      .orderBy("pid").collect().toSeq
    assert(bucketed === inline)
  }

  test("ring probe against the bucketed table shuffles ONE side only") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the ring join plans as SMJ/shuffle-hash —
    // the shape the 100 TB station side would force anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Spatial.bucketStations(stations, "sid", "slat", "slon", Cell,
        buckets = 4, table = "geo_stations_x")
      val cand = Spatial.ringCandidatesBucketed(spark, points, "pid",
        "plat", "plon", "geo_stations_x", Cell)
      val plan = cand.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).size
      assert(exchanges === 1, s"expected the probe-side exchange " +
        s"only, got $exchanges:\n${plan.take(2000)}")
      // and the result is the same candidate set as the inline path
      val inline = Spatial.ringCandidates(points, "pid", "plat",
        "plon", stations, "sid", "slat", "slon", Cell)
        .select("_pid", "_sid", "_d2")
        .orderBy("_pid", "_sid").collect().toSeq
      val viaBucket = cand.select("_pid", "_sid", "_d2")
        .orderBy("_pid", "_sid").collect().toSeq
      assert(viaBucket === inline)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("inline ring probe (unbucketed) shuffles both sides under SMJ") {
    // the contrast case: without the bucketed layout the same join
    // exchanges BOTH inputs — this is the shuffle bucketing removes
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = Spatial.ringCandidates(points, "pid", "plat", "plon",
        stations, "sid", "slat", "slon", Cell)
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(cand.queryExecution.executedPlan.toString).size
      assert(exchanges === 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }
}
