package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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
  * squared equirectangular micro-degrees `dlat² + dlon_wrapped²`
  * (longitude wraps at ±180°): monotone in true distance at warehouse
  * extents, exact in 64-bit (max ≈ 6.5e16 < 2⁶³), and — because it is
  * integer — bit-identical across engines, so nearest-neighbor
  * argmins can be oracle-checked by value hash.
  *
  * Scale shape (the reason this is a library operator and not a SQL
  * cross join): every operator buckets both sides onto a fixed grid of
  * `cellMicro`-sized cells and probes only the 3×3 neighbor ring — an
  * EQUI-join on cell id. Candidates per point ≈ 9 · station density ·
  * cell area; nothing is ever points × stations. At 100 TB the cell id
  * is also the natural partition/bucket key: pre-bucketing both sides
  * by cell makes the probe a zero-exchange sort-merge join.
  *
  * Contract: the ring probe is EXACT for any true nearest neighbor
  * within one cell width `cellMicro` of the query point (the 3×3 ring
  * covers that disc entirely); a point whose nearest station is
  * farther returns the nearest RING candidate if any, else a null
  * match. This radius-bounded semantics is what scales — an unbounded
  * exact NN over sparse stations degenerates to all-pairs — and the
  * cell width is the explicit accuracy/cost knob.
  */
object Spatial {

  /** Degrees of longitude in micro-degrees (wrap modulus). */
  val LonWrapMicro: Long = 360000000L

  /** Admissible cell widths, finest first — every rung divides both
    * 180e6 and 360e6 micro-degrees so the grid tiles exactly. */
  val CellLadderMicro: Seq[Long] = Seq(100000L, 200000L, 500000L,
    1000000L, 2000000L, 3000000L, 4000000L, 5000000L, 10000000L)

  /** Auto cell width: the FINEST ladder rung whose expected 3×3-ring
    * candidate count still reaches `targetPerRing` at the observed
    * station density — 9·n / cells(w) ≥ target with cells(w) =
    * (180e6/w)·(360e6/w). A pinned width is the q22-bug class of this
    * tier: at fixed w the ring join degenerates to O(points·stations)
    * as density grows; cells ∝ stations keeps per-point candidates
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
    (((latMicro + lit(90000000L)) / lit(cellMicro)).cast("long"),
      ((lonMicro + lit(180000000L)) / lit(cellMicro)).cast("long"))
  }

  /** Squared equirectangular distance in micro-degrees², longitude
    * wrapped at ±180°. Integer-exact (inputs are BIGINT micro-degrees).
    */
  def dist2(plat: Column, plon: Column, slat: Column, slon: Column)
      : Column = {
    val dlat = plat - slat
    val rawDlon = abs(plon - slon)
    val dlon = least(rawDlon, lit(LonWrapMicro) - rawDlon)
    dlat * dlat + dlon * dlon
  }

  /** 3×3 neighbor-ring candidate pairs between `points` and
    * `stations`: one row per (point, station) with the station in any
    * of the point's nine surrounding grid cells, carrying the exact
    * integer `d2`. The join is an equi-join on cell id — the only
    * shuffles are the two cell-keyed exchanges. Longitude cells wrap;
    * latitude cells outside the grid simply match nothing.
    *
    * Output: point id/lat/lon, station id, `d2` (BIGINT), plus
    * `_svalue` when `stationValue` is set (payload for interpolation).
    */
  def ringCandidates(points: DataFrame, pid: String, platCol: String,
      plonCol: String, stations: DataFrame, sid: String,
      slatCol: String, slonCol: String, cellMicro: Long,
      stationValue: Option[Column] = None): DataFrame = {
    val nLonCells = LonWrapMicro / cellMicro
    val (scl, scn) = cellOf(col(slatCol), col(slonCol), cellMicro)
    val svalue = stationValue.getOrElse(lit(null))
    val st = stations.select(col(sid).as("_sid"),
      col(slatCol).as("_slat"), col(slonCol).as("_slon"),
      svalue.as("_svalue"), scl.as("_cl"), scn.as("_cn"))
    val (pcl, pcn) = cellOf(col(platCol), col(plonCol), cellMicro)
    // nine probe cells per point: lat offsets clip off-grid naturally,
    // lon offsets wrap (+nLonCells keeps the operand non-negative so
    // % agrees across engines)
    val probes = points.select(col(pid).as("_pid"),
      col(platCol).as("_plat"), col(plonCol).as("_plon"),
      pcl.as("_pcl0"), pcn.as("_pcn0"))
      .withColumn("_di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dj", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("_pid"), col("_plat"), col("_plon"),
        (col("_pcl0") + col("_di")).as("_cl"),
        ((col("_pcn0") + col("_dj") + lit(nLonCells)) % lit(nLonCells))
          .as("_cn"))
    probes.join(st, Seq("_cl", "_cn"))
      .select(col("_pid"), col("_plat"), col("_plon"), col("_sid"),
        col("_svalue"),
        dist2(col("_plat"), col("_plon"), col("_slat"), col("_slon"))
          .as("_d2"))
  }

  /** Nearest station per point within the 3×3 cell ring (radius-bounded
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
      slatCol: String, slonCol: String, cellMicro: Long): DataFrame = {
    val cand = ringCandidates(points, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, cellMicro)
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
      cellMicro: Long): DataFrame = {
    val cand = ringCandidates(points, pid, platCol, plonCol,
      stations, sid, slatCol, slonCol, cellMicro,
      stationValue = Some(valueCents))
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

  /** ε-near-duplicate point pairs — entity resolution for locations:
    * the reference's location dimension dedups by EXACT coordinate
    * hash (`generate_location_hash`), so GPS-jittered re-submissions
    * of the same field create duplicate dimension rows; this returns
    * every pair within `epsMicro` micro-degrees (equirectangular,
    * wrap-aware) for the dedup tier's connected-components +
    * keep-representative machinery to collapse. Candidates come from
    * the 3×3 cell ring (requires `epsMicro ≤ cellMicro` so coverage
    * is exact — enforced), distinct-ed because neighbor rings
    * overlap; `id_a < id_b` canonical order.
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
    perCell.join(ring, Seq("cell_lat", "cell_lon"))
      .crossJoin(broadcast(global))
      .select(col("cell_lat"), col("cell_lon"), col("n"),
        col("sum_cents"), col("ring_n"), col("ring_sum"),
        (col("ring_sum") * col("g_n") * lit(den) >
          lit(num) * col("g_sum") * col("ring_n")).as("is_hot"))
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
