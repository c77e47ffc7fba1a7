package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Spatial
import graft.warehouse.Versioned

/** One-call geo mart build — the composed consumer flow of the
  * spatial tier (the README "Geo warehouse in 10 lines", as a
  * library call the way [[CorpusPipeline]] wraps the corpus tier):
  * derive the auto cell width from the observed station density,
  * enrich every field point with its nearest station (radius-bounded
  * NN) and a k-nearest IDW estimate of a station attribute, attach
  * the 10° reporting cell, and COMMIT the mart to the versioned lake
  * — one immutable, time-travelable snapshot per build.
  *
  * Scale posture inherits from the parts: ring probes are cell-keyed
  * equi-joins at the density-derived width (never points × stations),
  * IDW is exact-integer arithmetic, the lake append is one segment +
  * one manifest rename. For repeated builds against a large station
  * table, persist it once with [[Spatial.bucketStations]] and enrich
  * via the bucketed variants — the station side then never
  * reshuffles.
  */
object GeoPipeline {

  /** 10° reporting grid for the mart's cell columns. */
  val ReportCellMicro: Long = 10000000L

  /** Build + commit the enriched field mart. Returns the committed
    * lake version; read it back with `Versioned.read(spark, lakePath,
    * Some(v))`. Mart schema: (pid, lat, lon, cell_lat, cell_lon,
    * station, station_d2, n_cand, idw_n, idw_est).
    */
  def buildMart(spark: SparkSession, fields: DataFrame, pid: String,
      platCol: String, plonCol: String, stations: DataFrame,
      sid: String, slatCol: String, slonCol: String,
      valueCents: Column, lakePath: String, idwK: Int = 4,
      targetPerRing: Long = 8L): Long = {
    val w = Spatial.autoCellMicro(stations.count(), targetPerRing)
    val near = Spatial.nearestStation(fields, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, w)
    val est = Spatial.idwEstimateKnn(fields, pid, platCol, plonCol,
        stations, sid, slatCol, slonCol, valueCents, w, idwK)
      .select(col(pid), col("n_cand").as("idw_n"),
        col("est").as("idw_est"))
    val (rcl, rcn) = Spatial.cellOf(col(platCol), col(plonCol),
      ReportCellMicro)
    val mart = fields
      .select(col(pid), col(platCol).as("lat"), col(plonCol).as("lon"),
        rcl.as("cell_lat"), rcn.as("cell_lon"))
      .join(near.select(col(pid), col("station"),
        col("d2").as("station_d2"), col("n_cand")), Seq(pid), "left")
      .join(est, Seq(pid), "left")
    // a rebuild REPLACES the mart (overwrite commit): the latest
    // snapshot is always one whole build, and earlier builds stay
    // time-travelable until vacuumed
    Versioned.commit(mart, lakePath, overwrite = true)
  }
}
