package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grid-bucketed geospatial joins over integer micro-degree
  * coordinates — the spatial tier of an agro-climatic warehouse
  * (reference domain: locations keyed by lat/lon,
  * `etl/transform/cleaners.py` coordinate handling + the
  * `location_dim` of `db/init/01-schema.sql`). The reference resolves
  * coordinates to dimension rows only by exact hash
  * (`generate_location_hash`); the questions its users ask next —
  * "which weather station is nearest to this field?", "interpolate
  * soil pH at an unsampled point", "where are observations dense?" —
  * need a spatial JOIN, which this file provides Spark-first.
  *
  * Representation: coordinates are integer micro-degrees (lat ∈
  * [−90e6, 90e6], lon ∈ [−180e6, 180e6)) — exact in BIGINT in every
  * engine, no floating-point boundary behavior. The distance metric is
  * squared LOCALLY-SCALED equirectangular micro-degrees
  * `dlat² + ((dlon_wrapped · cosQ) div 2²⁰)²` (longitude wraps at
  * ±180°), where `cosQ` is a fixed-point integer cos of the pair's
  * midpoint-latitude degree band ([[CosQ]]): a degree of longitude
  * shrinks by cos(lat), and an unscaled metric overweights longitude
  * off the equator (at lat 60° it would rank a station 0.5° east
  * (~28 km) behind one 0.4° south (~44 km)). Scaled micro-degrees
  * track great-circle micro-degrees to within the 1°-band
  * quantization of the table; the metric stays all-BIGINT (max
  * ≈ 6.5e16 < 2⁶³) and — because the table is one shared integer
  * array — bit-identical across engines, so nearest-neighbor argmins
  * can be oracle-checked by value hash. Where geodesic truth is
  * required (reported distances, ε-contracts), the integer metric is
  * the candidate FILTER and [[haversineMeters]] the REFINE step
  * ([[nearDupPointsVerified]]).
  *
  * Scale shape (the reason this is a library operator and not a SQL
  * cross join): every operator buckets both sides onto a fixed grid of
  * `cellMicro`-sized cells and probes a neighbor ring — ±1 cell in
  * latitude and a PER-POINT longitude half-width `k` ≥ 1 cell sized so
  * the ring covers one cell width of SCALED distance at that latitude
  * (k ≈ sec(lat), full circle only adjacent to the poles where the
  * row holds few cells' worth of area anyway) — an EQUI-join on cell
  * id. Candidates per point ≈ ring cells · station density; nothing
  * is ever points × stations. At 100 TB the cell id is also the
  * natural partition/bucket key: [[bucketStations]] persists the big
  * side cell-bucketed so every probe against it is a ONE-SIDED
  * exchange (SpatialBucketSpec pins the plan). Real station sets are
  * zipf-dense (cities): a hot cell's candidate fan-out is inherent
  * output (every in-ring station IS a candidate), and the shuffle
  * skew it causes on the sort-merge path is exactly what AQE's
  * skew-join split handles — keep `spark.sql.adaptive.enabled` on
  * (default); no salting is needed because the join key is already
  * the finest meaningful unit. Skew price: AQE splits a hot probe
  * partition into ≈ hotBytes/advisoryPartitionSize tasks (each
  * re-reading the matching station partition), so the straggler bound
  * drops from the hot cell's whole candidate set to one
  * advisory-sized slice — rehearsed at 1M points with a 900k-point
  * metro cell in SpatialBucketSpec (split fires, values identical).
  * Caveat: the split needs BOTH join sides to be shuffle stages, so
  * it applies to the inline probes; [[bucketStations]] trades that
  * away (its scan side is fixed bucket files). A pathologically hot
  * PROBE load against a bucketed table is therefore DETECTED
  * ([[probeHotCellStats]], one map-side-combined aggregation) and
  * routed through the inline AQE-splittable path automatically by the
  * auto entry ([[nearestStationBucketedRouted]]) — values identical,
  * only the physical plan changes; width-explicit callers can also
  * raise the bucket count at write time.
  *
  * Contract: the ring probe is EXACT for any true nearest neighbor
  * within one cell width `cellMicro` of the query point IN THE SCALED
  * METRIC (the ring covers that disc entirely, at every latitude); a
  * point whose nearest station is farther returns the nearest RING
  * candidate if any, else a null match. This radius-bounded semantics
  * is what scales — an unbounded exact NN over sparse stations
  * degenerates to all-pairs — and the cell width is the explicit
  * accuracy/cost knob.
  */
object Spatial {

  /** Degrees of longitude in micro-degrees (wrap modulus). */
  val LonWrapMicro: Long = 360000000L

  /** Fixed-point scale of the cos table: 2²⁰. */
  val CosScale: Long = 1L << 20

  /** Fixed-point cos table, one entry per whole degree of |latitude|:
    * `CosQ(b) = round(cos(b°) · 2²⁰)` for b ∈ [0, 90] — CosQ(0) =
    * 2²⁰ exactly (the equator is unscaled), CosQ(90) = 0. Computed
    * via StrictMath (bit-reproducible on every JVM) and embedded
    * VERBATIM in the DuckDB oracles via [[cosQSqlList]], so both
    * engines read the same integers — the shared-coefficients idiom.
    * Weakly decreasing, which the ring-coverage bound relies on. */
  val CosQ: Array[Long] = Array.tabulate(91) { b =>
    math.round(StrictMath.cos(StrictMath.toRadians(b.toDouble)) *
      CosScale.toDouble)
  }

  /** [[CosQ]] as a DuckDB list literal (`[1048576, …, 0]`). */
  def cosQSqlList: String = CosQ.mkString("[", ", ", "]")

  /** Table lookup: `CosQ(band)` as a Column (band already clamped to
    * [0, 90] by callers). */
  private def cosAt(band: Column): Column =
    element_at(typedLit(CosQ.toSeq), (band + lit(1L)).cast("int"))

  /** Mean Earth radius, metres (IUGG). */
  val EarthRadiusM: Double = 6371000.0

  /** Admissible cell widths, finest first — every rung divides both
    * 180e6 and 360e6 micro-degrees so the grid tiles exactly. */
  val CellLadderMicro: Seq[Long] = Seq(100000L, 200000L, 500000L,
    1000000L, 2000000L, 3000000L, 4000000L, 5000000L, 10000000L)

  /** Auto cell width: the FINEST ladder rung whose expected base-ring
    * (3×3) candidate count still reaches `targetPerRing` at the
    * observed station density — 9·n / cells(w) ≥ target with cells(w)
    * = (180e6/w)·(360e6/w). (The latitude-adaptive ring of
    * [[ringCandidates]] widens that by ≈ sec(lat) per row — a bounded
    * constant over the populated bands that does not change the rung
    * choice.) A pinned width is the q22-bug class of this tier: at
    * fixed w the ring join degenerates to O(points·stations) as
    * density grows; cells ∝ stations keeps per-point candidates
    * constant, so total candidate volume stays linear in points.
    * Falls back to the coarsest rung (10°) for sparse station sets,
    * where a finer grid would leave rings empty.
    */
  def autoCellMicro(nStations: Long, targetPerRing: Long = 8L): Long =
    CellLadderMicro.find { w =>
      val cells = BigInt(180000000L / w) * BigInt(LonWrapMicro / w)
      BigInt(9) * nStations >= BigInt(targetPerRing) * cells
    }.getOrElse(CellLadderMicro.last)

  /** Grid cell coordinates for a micro-degree point: `cell_lat` =
    * (lat+90e6) div cellMicro, `cell_lon` = (lon+180e6) div cellMicro.
    * Operands are non-negative, so truncating and flooring division
    * agree in every engine. `cellMicro` must divide 360e6 so the
    * longitude ring wraps onto a whole number of cells.
    */
  def cellOf(latMicro: Column, lonMicro: Column, cellMicro: Long)
      : (Column, Column) = {
    require(LonWrapMicro % cellMicro == 0,
      s"cellMicro=$cellMicro must divide 360e6 micro-degrees")
    // the ring operators' ±1 wrap offsets need >= 3 distinct longitude
    // cells — at 2 (or 1) cells the wrapped probe offsets collapse
    // onto the same cell and ring candidates double-count
    require(cellMicro <= 120000000L,
      s"cellMicro=$cellMicro leaves < 3 longitude cells (max 120e6)")
    (((latMicro + lit(90000000L)) / lit(cellMicro)).cast("long"),
      ((lonMicro + lit(180000000L)) / lit(cellMicro)).cast("long"))
  }

  /** Squared locally-scaled equirectangular distance in scaled
    * micro-degrees², longitude wrapped at ±180° and scaled by the
    * fixed-point cos of the pair's midpoint-latitude degree band:
    * `dlat² + ((dlon · CosQ(band)) div 2²⁰)²` with
    * `band = min(90, |plat + slat| div 2e6) + bandShift`. All-BIGINT
    * and engine-portable (every division is non-negative, the cos
    * factor is a shared integer table).
    *
    * `bandShift = 0` (default) reads cos at the band's LOWER edge —
    * an upper bound of cos within the band, so the scaled distance
    * can only round toward the unscaled one; `bandShift = 1` reads
    * the UPPER edge — cos is then ≤ the true cos of any latitude in
    * the band, making the metric ADMISSIBLE (never overestimates the
    * band-quantized great-circle distance): the right pre-filter when
    * an exact scorer ([[haversineMeters]]) refines survivors, because
    * an admissible filter cannot drop a true match. */
  def dist2(plat: Column, plon: Column, slat: Column, slon: Column,
      bandShift: Int = 0): Column = {
    val dlat = plat - slat
    val rawDlon = abs(plon - slon)
    val dlon = least(rawDlon, lit(LonWrapMicro) - rawDlon)
    val band = least(lit(90L),
      (abs(plat + slat) / lit(2000000L)).cast("long")
        + lit(bandShift.toLong))
    val dlonEff = ((dlon * cosAt(band)) / lit(CosScale)).cast("long")
    dlat * dlat + dlonEff * dlonEff
  }

  /** Great-circle distance in metres (haversine, sphere of
    * [[EarthRadiusM]]) between micro-degree coordinates — the exact
    * geodesic RE-SCORER for candidates the integer metric pre-filters.
    * Double-precision; the operation order matches the oracle SQL
    * textually so both engines run the same IEEE expression (the
    * only residual divergence is sub-ulp libm noise, which callers
    * absorb by rounding reported distances). Wrap-safe: sin²(Δλ/2)
    * is periodic, so the ±180° seam needs no special case. */
  def haversineMeters(platM: Column, plonM: Column, slatM: Column,
      slonM: Column): Column = {
    val sdLat = sin(radians((slatM - platM).cast("double") /
      lit(2000000.0)))
    val sdLon = sin(radians((slonM - plonM).cast("double") /
      lit(2000000.0)))
    val h = sdLat * sdLat +
      cos(radians(platM.cast("double") / lit(1000000.0))) *
        cos(radians(slatM.cast("double") / lit(1000000.0))) *
        sdLon * sdLon
    lit(2.0) * lit(EarthRadiusM) * asin(sqrt(h))
  }

  /** Neighbor-ring candidate pairs between `points` and `stations`:
    * one row per (point, station) with the station in any of the
    * point's ring cells, carrying the exact integer scaled `_d2`
    * ([[dist2]] at the same `bandShift`). The join is an equi-join on
    * cell id — the only shuffles are the two cell-keyed exchanges.
    * Longitude cells wrap; latitude cells outside the grid simply
    * match nothing.
    *
    * Ring shape: ±1 cell in latitude (dlat is unscaled, so one cell
    * width of scaled distance never crosses two row boundaries) and a
    * PER-POINT longitude half-width `k` — the smallest k such that
    * every station within one cell width of SCALED distance falls
    * inside ±k columns. Derivation (all-integer, mirrored in the
    * oracle SQL): a qualifying station has
    * `floor(dlon · cq_mid / 2²⁰) ≤ cellMicro`, and `cq_mid ≥ cq :=
    * CosQ(min(90, (|plat| + cellMicro) div 1e6) + bandShift)` (table
    * weakly decreasing, the station is ≤ cellMicro of latitude away),
    * so `dlon ≤ Dmax := ((cellMicro+1)·2²⁰ − 1) div cq` and the
    * column distance is ≤ `k := (Dmax + cellMicro − 1) div
    * cellMicro`. k ≈ sec(lat): 1–2 at low latitude, growing toward
    * the poles; when 2k+1 ≥ nLonCells the probe covers each column of
    * the row EXACTLY once (offsets 0..nLonCells−1 — no duplicate
    * candidates, ever). cq = 0 (coverage interval touching the pole)
    * routes to the same full-circle branch via a guarded divisor.
    *
    * Output: point id/lat/lon, station id, `_d2` (BIGINT), plus
    * `_svalue` when `stationValue` is set (payload for interpolation).
    */
  def ringCandidates(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, cellMicro: Long,
      stationValue: Option[Column] = None, bandShift: Int = 0)
      : DataFrame = {
    val (scl, scn) = cellOf(col(slatCol), col(slonCol), cellMicro)
    val svalue = stationValue.getOrElse(lit(null))
    val st = stations.select(col(sid).as("_sid"),
      col(slatCol).as("_slat"), col(slonCol).as("_slon"),
      svalue.as("_svalue"), scl.as("_cl"), scn.as("_cn"))
    candFromProbes(
      probeRing(points, pid, platCol, plonCol, cellMicro, bandShift),
      st, bandShift)
  }

  /** The exploded per-point probe-cell frame (_pid,_plat,_plon,_cl,
    * _cn) — map-only; the per-point lon half-width derivation lives
    * in the [[ringCandidates]] scaladoc. Every division has a
    * non-negative numerator < 2^53, so the double-division + cast
    * idiom is exact and floor/trunc agree with DuckDB's `//`. */
  private def probeRing(points: DataFrame, pid: String,
      platCol: String, plonCol: String, cellMicro: Long,
      bandShift: Int): DataFrame = {
    val nLonCells = LonWrapMicro / cellMicro
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val bcov = least(lit(90L),
      ((abs(col(platCol)) + lit(cellMicro)) / lit(1000000L))
        .cast("long") + lit(bandShift.toLong))
    val cqSafe = greatest(cosAt(bcov), lit(1L))
    val dmax = (lit((cellMicro + 1L) * CosScale - 1L) / cqSafe)
      .cast("long")
    val k = least(
      ((dmax + lit(cellMicro - 1L)) / lit(cellMicro)).cast("long"),
      lit(nLonCells))
    val lonOffs = when(k * lit(2L) + lit(1L) >= lit(nLonCells),
      sequence(lit(0L), lit(nLonCells - 1L)))
      .otherwise(sequence(-k, k))
    points.select(col(pid).as("_pid"),
      col(platCol).as("_plat"), col(plonCol).as("_plon"),
      pcl.as("_pcl0"), pcn.as("_pcn0"), lonOffs.as("_offs"))
      .withColumn("_di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dj", explode(col("_offs")))
      .select(col("_pid"), col("_plat"), col("_plon"),
        (col("_pcl0") + col("_di")).as("_cl"),
        ((col("_pcn0") + col("_dj") + lit(nLonCells)) % lit(nLonCells))
          .as("_cn"))
  }

  /** The cell-keyed equi-join + exact scaled d² tail shared by the
    * inline and pre-bucketed candidate paths. */
  private def candFromProbes(probes: DataFrame, st: DataFrame,
      bandShift: Int): DataFrame =
    probes.join(st, Seq("_cl", "_cn"))
      .select(col("_pid"), col("_plat"), col("_plon"), col("_sid"),
        col("_svalue"),
        dist2(col("_plat"), col("_plon"), col("_slat"), col("_slon"),
          bandShift).as("_d2"))

  /** Nearest station per point within the cell ring (radius-bounded
    * nearest neighbor — see class contract). Ties break to the lowest
    * station id via a lexicographic min(struct) aggregation (one
    * map-side-combined shuffle, no window sort). Points with no ring
    * candidate are preserved with a null station and `n_cand = 0`.
    *
    * Output: (pid, station, d2, n_cand) ordered by nothing — callers
    * order.
    */
  def nearestStation(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, cellMicro: Long): DataFrame =
    nearestFromCand(points, pid,
      ringCandidates(points, pid, platCol, plonCol,
        stations, sid, slatCol, slonCol, cellMicro))

  /** The argmin + point-preserving tail shared by the inline and
    * pre-bucketed nearest-station paths. */
  private def nearestFromCand(points: DataFrame, pid: String,
      cand: DataFrame): DataFrame = {
    val best = cand.groupBy("_pid")
      .agg(min(struct(col("_d2"), col("_sid"))).as("_best"),
        count(lit(1)).as("n_cand"))
      .select(col("_pid"), col("_best._sid").as("station"),
        col("_best._d2").as("d2"), col("n_cand"))
    points.select(col(pid).as("_pid"))
      .join(best, Seq("_pid"), "left")
      .select(col("_pid").as(pid), col("station"), col("d2"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }

  /** [[nearestStation]] at the [[autoCellMicro]] width for the
    * observed station count (one count job, mirroring the
    * `autoSignBits` sizing idiom of the embedding tier). The output
    * carries the chosen width as `cell_micro` for observability. */
  def nearestStationAuto(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, targetPerRing: Long = 8L)
      : DataFrame = {
    val w = autoCellMicro(stations.count(), targetPerRing)
    nearestStation(points, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, w)
      .withColumn("cell_micro", lit(w))
  }

  /** Persist a station table BUCKETED BY GRID CELL — the co-location
    * half of the class contract ("at 100 TB the cell id is the
    * natural partition/bucket key"): once the big station/observation
    * side lives in a cell-bucketed table, every ring probe against it
    * is a one-sided exchange — the bucketed scan already satisfies
    * the join's clustering, so ONLY the (much smaller, exploded)
    * probe side shuffles, and repeated queries amortize the station
    * shuffle to zero. Canonical schema: (station_id, slat, slon,
    * cell_lat, cell_lon), bucketed+sorted by (cell_lat, cell_lon).
    * SpatialBucketSpec pins the single-exchange plan. */
  def bucketStations(stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, cellMicro: Long,
      buckets: Int, table: String,
      payloadCols: Seq[String] = Nil,
      nStations: Option[Long] = None): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (scl, scn) = cellOf(col(slatCol), col(slonCol), cellMicro)
    stations.select(col(sid).as("station_id") +:
        col(slatCol).as("slat") +: col(slonCol).as("slon") +:
        scl.as("cell_lat") +: scn.as("cell_lon") +:
        payloadCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, "cell_lat", "cell_lon")
      .sortBy("cell_lat", "cell_lon")
      .format("parquet")
      .saveAsTable(table)
    // persist the stats every auto-width probe needs as TABLE
    // PROPERTIES — the row count and the grid width the cell columns
    // were derived with. Readers get both from the catalog without
    // launching a job ([[bucketedStationMeta]], zero-job assertion in
    // SpatialBucketSpec). Callers that already counted the input
    // ([[bucketStationsAuto]]'s rung pick, a memoized corpus count)
    // thread it via `nStations` — counting the just-written table
    // again was one of the two redundant scans per bucketing the r18
    // review flagged; the count-here fallback stays for callers with
    // a pinned width and no count in hand.
    val sess = stations.sparkSession
    val n = nStations.getOrElse(sess.table(table).count())
    sess.sql(s"ALTER TABLE $table SET TBLPROPERTIES(" +
      s"'graft.cell_micro'='$cellMicro','graft.n_stations'='$n')")
      : Unit
  }

  /** [[bucketStations]] at the [[autoCellMicro]] width: ONE count job
    * at write time picks the rung, and both the rung and the count
    * land in the table properties — every subsequent auto-width probe
    * reads them from the catalog instead of re-scanning the station
    * table per query. Returns the chosen width. */
  def bucketStationsAuto(stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, buckets: Int, table: String,
      payloadCols: Seq[String] = Nil, targetPerRing: Long = 8L): Long = {
    val n = stations.count()
    val w = autoCellMicro(n, targetPerRing)
    bucketStations(stations, sid, slatCol, slonCol, w, buckets, table,
      payloadCols, nStations = Some(n))
    w
  }

  /** The persisted (cellMicro, nStations) of a [[bucketStations]]
    * table — a catalog-metadata read, NO Spark job. Fails loudly on a
    * pre-metadata legacy table. */
  def bucketedStationMeta(spark: SparkSession, table: String)
      : (Long, Long) = {
    val props = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties
    (props.get("graft.cell_micro"), props.get("graft.n_stations")) match {
      case (Some(w), Some(n)) => (w.toLong, n.toLong)
      case _ => throw new IllegalArgumentException(
        s"bucketedStationMeta: $table carries no graft.cell_micro/" +
          "graft.n_stations properties - rewrite it with " +
          "bucketStations (r18+)")
    }
  }

  /** (total probe points, hottest-cell count) of a probe set at grid
    * width `cellMicro` — ONE map-side-combined aggregation whose
    * shuffle carries only occupied-cell rows. The detector input for
    * hot-PROBE routing: the class contract notes AQE's skew split
    * cannot fire against a bucketed scan side, so a pathologically
    * concentrated probe load must be DETECTED and routed through the
    * inline (both-sides-shuffle, AQE-splittable) path instead of
    * silently straggling on one bucket. */
  def probeHotCellStats(points: DataFrame, platCol: String,
      plonCol: String, cellMicro: Long): (Long, Long) = {
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val r = points.select(pcl.as("_cl"), pcn.as("_cn"))
      .groupBy("_cl", "_cn").agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum("_n"), lit(0L)).as("_total"),
        coalesce(max("_n"), lit(0L)).as("_mx"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** [[nearestStationBucketedAuto]] with the routing decision
    * exposed: returns (result, routedInline). A probe load whose
    * hottest cell holds more than `maxHotShare` of the points AND at
    * least `minHotRows` rows routes through the INLINE path reading
    * the same persisted table — both join sides are then shuffle
    * stages, so AQE's skew split bounds the straggler to one
    * advisory-sized slice (rehearsed at 1M points in
    * SpatialBucketSpec); everything else keeps the one-sided-shuffle
    * bucketed plan. Values are identical on both routes (the inline
    * path re-derives the same cells from the table's slat/slon), so
    * routing never changes results — only the physical plan. The
    * `minHotRows` floor keeps small probe sets (where a straggler
    * partition is small anyway) from paying the inline re-shuffle of
    * the station side. */
  def nearestStationBucketedRouted(spark: SparkSession,
      points: DataFrame, pid: String, platCol: String, plonCol: String,
      stationTable: String, maxHotShare: Double = 0.25,
      minHotRows: Long = 100000L): (DataFrame, Boolean) = {
    val w = bucketedStationMeta(spark, stationTable)._1
    val (total, mx) = probeHotCellStats(points, platCol, plonCol, w)
    val hot = mx >= minHotRows &&
      mx.toDouble > maxHotShare * total.toDouble
    if (hot)
      (nearestStation(points, pid, platCol, plonCol,
        spark.table(stationTable), "station_id", "slat", "slon", w),
        true)
    else
      (nearestStationBucketed(spark, points, pid, platCol, plonCol,
        stationTable, w), false)
  }

  /** [[nearestStationBucketed]] at the table's OWN persisted width —
    * no per-query station count, no width-mismatch foot-gun — with
    * automatic hot-probe mitigation ([[nearestStationBucketedRouted]]
    * at the default thresholds): the detection aggregation is one
    * cheap two-column pass, and a pathological probe load transparently
    * takes the AQE-splittable inline plan. */
  def nearestStationBucketedAuto(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String): DataFrame =
    nearestStationBucketedRouted(spark, points, pid, platCol, plonCol,
      stationTable)._1

  /** [[ringCandidates]] against a [[bucketStations]] table: the
    * station side joins STRAIGHT OFF its bucketed scan (no exchange
    * — the bucket key IS the join key), only the probe side
    * shuffles. */
  def ringCandidatesBucketed(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String, cellMicro: Long,
      stationValue: Option[Column] = None, bandShift: Int = 0)
      : DataFrame = {
    val svalue = stationValue.getOrElse(lit(null))
    val st = spark.table(stationTable).select(
      col("station_id").as("_sid"), col("slat").as("_slat"),
      col("slon").as("_slon"), svalue.as("_svalue"),
      col("cell_lat").as("_cl"), col("cell_lon").as("_cn"))
    candFromProbes(
      probeRing(points, pid, platCol, plonCol, cellMicro, bandShift),
      st, bandShift)
  }

  /** [[nearestStation]] against a [[bucketStations]] table — same
    * result, one-sided shuffle (SpatialBucketSpec asserts both). The
    * caller passes the SAME `cellMicro` the table was bucketed with
    * (the cell columns are physical there). */
  def nearestStationBucketed(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String, cellMicro: Long): DataFrame =
    nearestFromCand(points, pid,
      ringCandidatesBucketed(spark, points, pid, platCol, plonCol,
        stationTable, cellMicro))

  /** [[idwEstimate]] against a [[bucketStations]] table —
    * `valueCents` is evaluated over the table's payload columns
    * (pass them at write time via `payloadCols`). Same one-sided
    * shuffle as the other bucketed probes. */
  def idwEstimateBucketed(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String, cellMicro: Long, valueCents: Column)
      : DataFrame =
    idwFromCand(points, pid,
      ringCandidatesBucketed(spark, points, pid, platCol, plonCol,
        stationTable, cellMicro, stationValue = Some(valueCents)))

  /** The k nearest ring stations per point (radius-bounded kNN —
    * same exactness contract as [[nearestStation]], extended to k:
    * EXACT for every true neighbor within one cell width of scaled
    * distance; ring candidates beyond that radius fill remaining
    * slots best-effort). Rank orders by (scaled d², station id) —
    * fully deterministic; one window sort per point group. Points
    * with an empty ring emit no rows (left-join [[nearestStation]]'s
    * preserved shape if presence matters).
    *
    * Output: (pid, station, d2, rank) with rank ∈ 1..kNearest.
    */
  def kNearestStations(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, cellMicro: Long,
      kNearest: Int): DataFrame =
    knnTail(ringCandidates(points, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, cellMicro), pid, kNearest)

  /** The deterministic (scaled d², station id) rank cut shared by the
    * kNN paths — one window sort per point group, `_rk` kept. */
  private def knnCut(cand: DataFrame, kNearest: Int): DataFrame = {
    require(kNearest >= 1, s"kNearest must be >= 1, got $kNearest")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(col("_d2"), col("_sid"))
    cand.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= kNearest)
  }

  private def knnTail(cand: DataFrame, pid: String,
      kNearest: Int): DataFrame =
    knnCut(cand, kNearest)
      .select(col("_pid").as(pid), col("_sid").as("station"),
        col("_d2").as("d2"), col("_rk").cast("long").as("rank"))

  /** [[kNearestStations]] against a [[bucketStations]] table at its
    * OWN persisted width — the kNN member of the family on the
    * one-sided-shuffle layout (the probe side shuffles, the station
    * side joins straight off its bucketed scan). */
  def kNearestStationsBucketed(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String, kNearest: Int): DataFrame =
    knnTail(ringCandidatesBucketed(spark, points, pid, platCol,
      plonCol, stationTable, bucketedStationMeta(spark, stationTable)._1),
      pid, kNearest)

  /** Metres per degree of latitude on the [[EarthRadiusM]] sphere. */
  val MetersPerDegree: Double = 2.0 * math.Pi * EarthRadiusM / 360.0

  /** The integer pre-gate radius (scaled micro-degrees) for a
    * geodesic radius of `meters`: the degree-equivalent × 1.3 — the
    * same ~30 % margin as [[nearDupPointsVerified]], absorbing the
    * equirect-vs-great-circle and band-quantization slop so the
    * admissible pre-filter never drops a true in-radius station. */
  def radiusPregateMicro(meters: Double): Long =
    math.ceil(meters / MetersPerDegree * 1000000.0 * 1.3).toLong

  /** All stations within `radiusMeters` TRUE geodesic distance of
    * each point — the range-query member of the spatial family
    * (nearest / kNN / range / ε-dedup), filter-and-refine like
    * [[nearDupPointsVerified]]: integer ring candidates at the
    * admissible metric (cell width = the coarser of the auto rung
    * and the pre-gate-covering rung, so both the density rule AND
    * ring coverage of the radius hold), pre-gated at
    * [[radiusPregateMicro]], then one exact haversine verdict per
    * survivor. Radii whose pre-gate exceeds the coarsest ladder rung
    * (≈ 850 km) are rejected — a planet-scale radius should be a
    * grid aggregation, not a ring probe.
    *
    * Polar cap: the equirect/great-circle ratio is UNBOUNDED for
    * over-the-pole paths (two points at lat 86.5° with Δλ = 180° are
    * 778 km apart over the pole but measure ~9.4e6 scaled micro along
    * the parallel), so no constant pre-gate margin is admissible
    * there. A true over-the-pole in-radius pair necessarily has BOTH
    * latitudes within the radius of a pole, i.e. within `pregate` of
    * ±90e6 — for pairs whose latitude coverage reaches that cap the
    * gate drops the dlon term entirely and keeps only `dlat²` (the
    * meridional component never exceeds the great-circle distance, so
    * dlat-only is always admissible), letting the exact haversine
    * verdict decide. Ring coverage needs no special case: `cell ≥
    * pregate`, so any cap point's coverage band reaches 90° where
    * cq = 0 and [[ringCandidates]] already probes the full longitude
    * circle. The caps are a vanishing fraction of the globe, so the
    * extra haversine work is negligible.
    *
    * Output: (pid, station, dist_m) — mm-rounded geodesic metres,
    * one row per in-radius (point, station).
    */
  def stationsWithinMeters(points: DataFrame, pid: String,
      platCol: String, plonCol: String, stations: DataFrame,
      sid: String, slatCol: String, slonCol: String,
      radiusMeters: Double, targetPerRing: Long = 8L): DataFrame = {
    val pregate = radiusPregateMicro(radiusMeters)
    val cell = math.max(autoCellMicro(stations.count(), targetPerRing),
      epsCellMicro(pregate))
    require(pregate <= cell,
      s"stationsWithinMeters: radius ${radiusMeters}m needs a " +
        s"$pregate-micro pre-gate > the coarsest ladder rung " +
        s"(${CellLadderMicro.last}) - use a grid aggregation instead")
    radiusVerdict(ringCandidates(points, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, cell,
      stationValue = Some(struct(col(slatCol).as("lat"),
        col(slonCol).as("lon"))),
      bandShift = 1), pid, pregate, radiusMeters)
  }

  /** The polar-safe pre-gate + exact haversine verdict tail shared by
    * the inline and bucketed radius queries ([[stationsWithinMeters]]
    * scaladoc derives the cap rule). `cand` is a ring-candidate frame
    * whose `_svalue` carries the station (lat, lon) struct and whose
    * `_d2` was computed at `bandShift = 1`. */
  private def radiusVerdict(cand: DataFrame, pid: String,
      pregate: Long, radiusMeters: Double): DataFrame = {
    val pre2 = lit(pregate) * lit(pregate)
    val dlat = col("_plat") - col("_svalue.lat")
    val polar = greatest(abs(col("_plat")), abs(col("_svalue.lat"))) +
      lit(pregate) >= lit(90000000L)
    cand
      .where(when(polar, dlat * dlat <= pre2)
        .otherwise(col("_d2") <= pre2))
      .select(col("_pid").as(pid), col("_sid").as("station"),
        round(haversineMeters(col("_plat"), col("_plon"),
          col("_svalue.lat"), col("_svalue.lon")), 3).as("dist_m"))
      .where(col("dist_m") <= lit(radiusMeters))
  }

  /** [[stationsWithinMeters]] against a [[bucketStations]] table —
    * the radius query on the one-sided-shuffle layout: candidates off
    * the bucketed scan at the table's OWN persisted width, same
    * polar-safe admissible pre-gate and haversine verdict. Requires
    * the persisted width to cover the radius pre-gate (the ring
    * coverage contract is per-width and the cell columns are
    * physical) — rebucket coarser, or run the inline path, when it
    * doesn't. */
  def stationsWithinMetersBucketed(spark: SparkSession,
      points: DataFrame, pid: String, platCol: String, plonCol: String,
      stationTable: String, radiusMeters: Double): DataFrame = {
    val (w, _) = bucketedStationMeta(spark, stationTable)
    val pregate = radiusPregateMicro(radiusMeters)
    require(pregate <= w,
      s"stationsWithinMetersBucketed: radius ${radiusMeters}m needs a " +
        s"$pregate-micro pre-gate > $stationTable's persisted cell " +
        s"width $w - rebucket coarser or use stationsWithinMeters")
    radiusVerdict(ringCandidatesBucketed(spark, points, pid, platCol,
      plonCol, stationTable, w,
      stationValue = Some(struct(col("slat").as("lat"),
        col("slon").as("lon"))),
      bandShift = 1), pid, pregate, radiusMeters)
  }

  /** Inverse-distance-weighted estimate of a station attribute at each
    * point, from the stations in the point's 3×3 cell ring. Weights are
    * the INTEGER `10¹⁸ div (d2+1)` — deterministic in every engine (no
    * float reciprocal) — and both Σw·v and Σw accumulate as exact
    * DECIMAL(38,0), so the estimate `Σw·v / Σw` is one double division
    * of two exact integers: bit-identical regardless of partitioning or
    * summation order. A coincident station (d2=0) dominates with weight
    * 10¹⁸, the IDW limit behavior. `valueCents` must be an integral
    * column (fixed-point cents of the attribute).
    *
    * Output: (pid, n_cand, est) with `est` in the original unit
    * (cents/100); null when the ring is empty.
    */
  def idwEstimate(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, valueCents: Column,
      cellMicro: Long): DataFrame =
    idwFromCand(points, pid,
      ringCandidates(points, pid, platCol, plonCol,
        stations, sid, slatCol, slonCol, cellMicro,
        stationValue = Some(valueCents)))

  /** The integer-weight + exact-decimal-sum + point-restore tail
    * shared by the all-ring and k-nearest IDW variants. */
  private def idwFromCand(points: DataFrame, pid: String,
      cand: DataFrame): DataFrame = {
    val w = expr("CAST(1000000000000000000 AS BIGINT) div (_d2 + 1)")
    val dec38 = DecimalType(38, 0)
    val agg = cand
      .select(col("_pid"), w.cast(dec38).as("_w"),
        col("_svalue").cast(dec38).as("_v"))
      .groupBy("_pid")
      .agg(sum(col("_w") * col("_v")).as("_num"),
        sum(col("_w")).as("_den"), count(lit(1)).as("n_cand"))
      .select(col("_pid"), col("n_cand"),
        (col("_num").cast("double") / col("_den").cast("double") /
          lit(100.0)).as("est"))
    points.select(col(pid).as("_pid"))
      .join(agg, Seq("_pid"), "left")
      .select(col("_pid").as(pid),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("est"))
  }

  /** IDW restricted to each point's k NEAREST ring stations — the
    * textbook Shepard form (a far station's 1/d² weight is tiny but
    * at warehouse density the tail COUNT isn't, and the k-cut also
    * bounds the per-point work independent of ring density). Rank by
    * (scaled d², station id) like [[kNearestStations]]; weights and
    * sums stay the exact-integer [[idwEstimate]] arithmetic, so the
    * estimate remains bit-identical across engines. `n_cand` reports
    * the stations actually used (≤ kNearest).
    */
  def idwEstimateKnn(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, valueCents: Column,
      cellMicro: Long, kNearest: Int): DataFrame =
    idwFromCand(points, pid,
      knnCut(ringCandidates(points, pid, platCol, plonCol,
        stations, sid, slatCol, slonCol, cellMicro,
        stationValue = Some(valueCents)), kNearest).drop("_rk"))

  /** [[idwEstimateKnn]] against a [[bucketStations]] table at its OWN
    * persisted width — `valueCents` evaluates over the table's payload
    * columns, same one-sided shuffle as the other bucketed probes. */
  def idwEstimateKnnBucketed(spark: SparkSession, points: DataFrame,
      pid: String, platCol: String, plonCol: String,
      stationTable: String, valueCents: Column, kNearest: Int)
      : DataFrame =
    idwFromCand(points, pid,
      knnCut(ringCandidatesBucketed(spark, points, pid, platCol,
        plonCol, stationTable,
        bucketedStationMeta(spark, stationTable)._1,
        stationValue = Some(valueCents)), kNearest).drop("_rk"))

  /** ε-near-duplicate point pairs — entity resolution for locations:
    * the reference's location dimension dedups by EXACT coordinate
    * hash (`generate_location_hash`), so GPS-jittered re-submissions
    * of the same field create duplicate dimension rows; this returns
    * every pair within `epsMicro` SCALED micro-degrees ([[dist2]] —
    * wrap-aware, cos-scaled) for the dedup tier's
    * connected-components + keep-representative machinery to
    * collapse. Candidates come from the cell ring (requires
    * `epsMicro ≤ cellMicro` so coverage is exact — enforced),
    * distinct-ed because neighbor rings overlap; `id_a < id_b`
    * canonical order. For a geodesically-true ε in metres use
    * [[nearDupPointsVerified]].
    */
  def nearDupPoints(points: DataFrame, pid: String, platCol: String,
      plonCol: String, cellMicro: Long, epsMicro: Long): DataFrame = {
    require(epsMicro >= 0 && epsMicro <= cellMicro,
      s"nearDupPoints: epsMicro=$epsMicro must be in [0, cellMicro]")
    ringCandidates(points, pid, platCol, plonCol,
      points, pid, platCol, plonCol, cellMicro)
      .where(col("_pid") < col("_sid") &&
        col("_d2") <= lit(epsMicro) * lit(epsMicro))
      .select(col("_pid").as("id_a"), col("_sid").as("id_b"),
        col("_d2").as("d2"))
      .distinct()
  }

  /** The finest [[CellLadderMicro]] rung ≥ `epsMicro` — the
    * eps-matched cell width for ε-neighborhood operators. A width
    * far coarser than ε is the tier's pinned-width bug class in its
    * worst form: ring candidates scale with (cell/ε)² times the
    * ε-neighborhood (e.g. 10° cells for ε = 0.01° probe ~10⁶× the
    * target area); the finest covering rung cuts that to the ring
    * constant. */
  def epsCellMicro(epsMicro: Long): Long =
    CellLadderMicro.find(_ >= epsMicro).getOrElse(CellLadderMicro.last)

  /** Filter-and-refine ε-near-duplicate pairs with geodesically TRUE
    * distances: candidates come from the integer ring at the
    * ADMISSIBLE metric (`bandShift = 1` — never overestimates, so no
    * true pair is dropped by the pre-filter), pre-gated at
    * `pregateMicro` scaled micro-degrees, then RE-SCORED with exact
    * [[haversineMeters]]; a pair survives iff its rounded haversine
    * distance ≤ `epsMeters`. Callers size `pregateMicro` ≥
    * epsMeters-in-micro-degrees with margin (1 m ≈ 8.99 micro-deg;
    * ~30 % margin absorbs the equirect-vs-great-circle and band
    * quantization slop at warehouse ε) and the cell width from
    * [[epsCellMicro]] (default). Integer candidate generation keeps
    * the plan deterministic and equi-joined; the one double
    * expression runs only on the bounded survivor set.
    *
    * Output: (id_a, id_b, dist_m) with id_a < id_b, dist_m rounded
    * to mm (absorbs sub-ulp libm divergence across engines).
    */
  def nearDupPointsVerified(points: DataFrame, pid: String,
      platCol: String, plonCol: String, pregateMicro: Long,
      epsMeters: Double, cellMicroOpt: Option[Long] = None)
      : DataFrame = {
    val cellMicro = cellMicroOpt.getOrElse(epsCellMicro(pregateMicro))
    require(pregateMicro >= 0 && pregateMicro <= cellMicro,
      s"nearDupPointsVerified: pregateMicro=$pregateMicro must be in " +
        s"[0, cellMicro=$cellMicro]")
    val cand = ringCandidates(points, pid, platCol, plonCol,
      points, pid, platCol, plonCol, cellMicro,
      stationValue = Some(struct(col(platCol).as("lat"),
        col(plonCol).as("lon"))),
      bandShift = 1)
    cand.where(col("_pid") < col("_sid") &&
        col("_d2") <= lit(pregateMicro) * lit(pregateMicro))
      .select(col("_pid").as("id_a"), col("_sid").as("id_b"),
        round(haversineMeters(col("_plat"), col("_plon"),
          col("_svalue.lat"), col("_svalue.lon")), 3).as("dist_m"))
      .where(col("dist_m") <= lit(epsMeters))
      .distinct()
  }

  /** Local hot-spot detection (the Getis–Ord Gi* family in its
    * integer-deterministic form): a cell is HOT when the mean of its
    * 3×3 ring exceeds `num/den` times the global mean. Means are
    * never materialized — the comparison cross-multiplies exact
    * integer sums (ring_sum·global_n·den > num·global_sum·ring_n), so
    * no float boundary exists and the verdict hash-compares across
    * engines. Two linear cell-keyed aggregations (per-cell, then 9×
    * ring contributions) plus one broadcast global scalar.
    *
    * Output per occupied cell: (cell_lat, cell_lon, n, sum_cents,
    * ring_n, ring_sum, is_hot) — is_hot non-null.
    */
  def hotSpots(points: DataFrame, platCol: String, plonCol: String,
      valueCents: Column, cellMicro: Long, num: Long = 3L,
      den: Long = 2L): DataFrame = {
    val nLonCells = LonWrapMicro / cellMicro
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val cells = points.select(pcl.as("cell_lat"), pcn.as("cell_lon"),
      valueCents.as("_v"))
    val perCell = cells.groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("sum_cents"))
    val ring = perCell
      .withColumn("_di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dj", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select((col("cell_lat") + col("_di")).as("cell_lat"),
        ((col("cell_lon") + col("_dj") + lit(nLonCells)) % lit(nLonCells))
          .as("cell_lon"),
        col("n"), col("sum_cents"))
      .groupBy("cell_lat", "cell_lon")
      .agg(sum(col("n")).as("ring_n"), sum(col("sum_cents")).as("ring_sum"))
    val global = perCell.agg(sum(col("n")).as("g_n"),
      sum(col("sum_cents")).as("g_sum"))
    // cross-multiply in DECIMAL(38,0): with ~1e10 points and cent
    // sums ~1e15 the BIGINT triple products exceed 2^63 — Spark would
    // silently wrap (non-ANSI) or error (ANSI) while DuckDB raises;
    // exact decimals keep the verdict correct at any corpus scale
    // (the idwEstimate idiom)
    val d38 = DecimalType(38, 0)
    perCell.join(ring, Seq("cell_lat", "cell_lon"))
      .crossJoin(broadcast(global))
      .select(col("cell_lat"), col("cell_lon"), col("n"),
        col("sum_cents"), col("ring_n"), col("ring_sum"),
        (col("ring_sum").cast(d38) * col("g_n").cast(d38) * lit(den) >
          lit(num) * col("g_sum").cast(d38) * col("ring_n").cast(d38))
          .as("is_hot"))
  }

  /** Grid-density spatial clustering (the STING/GriDBSCAN family:
    * DBSCAN with the grid cell as the density unit): a cell is DENSE
    * when it holds at least `minPts` points; dense cells that are
    * 8-neighbors (longitude wrapping) merge into one cluster via
    * connected components; every point in a dense cell gets its
    * cluster id (the component's minimum encoded cell id), points in
    * sparse cells are noise (null cluster).
    *
    * Scale shape: density is one cell-keyed count; the component graph
    * has one node per DENSE CELL — orders of magnitude smaller than
    * the point set (the reason grid-DBSCAN scales where point-level
    * DBSCAN's ε-join does not) — contracted by the same
    * large-star/small-star loop the dedup tier uses; the final assign
    * is a cell-keyed equi-join back to points.
    *
    * Output: (pid, cell_lat, cell_lon, cluster BIGINT nullable)
    * — cluster ids are minima of the row-major cell index
    * `cell_lat·nLonCells + cell_lon` (collision-free at every ladder
    * width), stable across engines.
    */
  def gridClusters(points: DataFrame, pid: String, platCol: String,
      plonCol: String, cellMicro: Long, minPts: Long): DataFrame = {
    val nLonCells = LonWrapMicro / cellMicro
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val pts = points.select(col(pid).as("_pid"),
      pcl.as("cell_lat"), pcn.as("cell_lon"))
    val dense = pts.groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("_n")).where(col("_n") >= minPts)
      .select(col("cell_lat"), col("cell_lon"),
        (col("cell_lat") * lit(nLonCells) + col("cell_lon")).as("_cid"))
    // dense-cell adjacency (8-neighborhood, lon wraps): probe the ring
    // and keep hits on other dense cells — an equi-join on cell id
    val probes = dense
      .withColumn("_di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dj", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("_cid").as("id_a"),
        (col("cell_lat") + col("_di")).as("cell_lat"),
        ((col("cell_lon") + col("_dj") + lit(nLonCells)) % lit(nLonCells))
          .as("cell_lon"))
    val edges = probes
      .join(dense.select(col("cell_lat"), col("cell_lon"),
        col("_cid").as("id_b")), Seq("cell_lat", "cell_lon"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val labels = Dedup.connectedComponentsStar(edges, "id_a", "id_b",
      materializeResult = false)
      .select(col("doc_id").as("_cid"), col("cluster_rep"))
    // isolated dense cells are their own singleton cluster
    val cellCluster = dense.join(labels, Seq("_cid"), "left")
      .select(col("cell_lat"), col("cell_lon"),
        coalesce(col("cluster_rep"), col("_cid")).as("cluster"))
    pts.join(cellCluster, Seq("cell_lat", "cell_lon"), "left")
      .select(col("_pid").as(pid), col("cell_lat"), col("cell_lon"),
        col("cluster"))
  }

  /** Spatial block split — train/val/test assignment at the CELL
    * level, not the point level (Roberts et al. 2017, "blocked"
    * cross-validation): spatially autocorrelated neighbors land in
    * the SAME split because the whole cell does, so a model can't
    * leak across splits through near-identical adjacent points (the
    * geospatial analogue of the dedup tier's cluster-aware
    * `clusterSplit`). Assignment hashes the row-major cell id through
    * the engine's portable md5 idiom — deterministic, engine-portable,
    * and independent of point order or partitioning.
    *
    * Output: (pid, cell_lat, cell_lon, split) with split ∈
    * train/val/test at ≈(100−valPct−testPct)/valPct/testPct percent
    * of CELLS. Map-only over points — no shuffle at all.
    */
  def blockSplit(points: DataFrame, pid: String, platCol: String,
      plonCol: String, cellMicro: Long, valPct: Long = 20L,
      testPct: Long = 20L): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"blockSplit: bad split percents ($valPct, $testPct)")
    val nLonCells = LonWrapMicro / cellMicro
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val cid = (pcl * lit(nLonCells) + pcn).cast("string")
    val bucket = Dedup.h30(cid) % lit(100L)
    points.select(col(pid).as(pid), pcl.as("cell_lat"),
      pcn.as("cell_lon"),
      when(bucket < lit(100L - valPct - testPct), "train")
        .when(bucket < lit(100L - testPct), "val")
        .otherwise("test").as("split"))
  }

  /** Per-cell density census with 3×3 ring smoothing: for every cell
    * that contains at least one point — (cell_lat, cell_lon, n_points,
    * n_stations, ring_points) where `ring_points` sums point counts
    * over the cell and its eight neighbors (the smoothed density used
    * for hot-spot detection). Two linear aggregations (points emit one
    * row per neighbor cell — 9n rows, one shuffle) plus one station
    * count; joins are cell-keyed equi-joins.
    */
  def ringDensity(points: DataFrame, platCol: String, plonCol: String,
      stations: DataFrame, slatCol: String, slonCol: String,
      cellMicro: Long): DataFrame = {
    val nLonCells = LonWrapMicro / cellMicro
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    val ptCells = points.select(pcl.as("cell_lat"), pcn.as("cell_lon"))
    val perCell = ptCells.groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("n_points"))
    // ring contributions: each point also counts toward its 8 neighbors
    val contrib = ptCells
      .withColumn("_di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dj", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select((col("cell_lat") + col("_di")).as("cell_lat"),
        ((col("cell_lon") + col("_dj") + lit(nLonCells)) % lit(nLonCells))
          .as("cell_lon"))
      .groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("ring_points"))
    val (scl, scn) = cellOf(col(slatCol), col(slonCol), cellMicro)
    val stCells = stations.select(scl.as("cell_lat"), scn.as("cell_lon"))
      .groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("n_stations"))
    perCell.join(contrib, Seq("cell_lat", "cell_lon"), "left")
      .join(stCells, Seq("cell_lat", "cell_lon"), "left")
      .select(col("cell_lat"), col("cell_lon"), col("n_points"),
        coalesce(col("n_stations"), lit(0L)).as("n_stations"),
        col("ring_points"))
  }
}
