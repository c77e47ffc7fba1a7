package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private val Cell = 10000000L // 10° cells, as the q263-q265 queries use

  private def pts(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("pid", "plat", "plon")
  private def sts(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("sid", "slat", "slon")

  private def nearest(p: DataFrame, s: DataFrame) =
    Spatial.nearestStation(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", Cell)
      .orderBy("pid")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq

  test("nearestStation: picks the closer ring candidate, exact d2") {
    // point at origin; station 1 at (1°, 1°), station 2 at (2°, 0°)
    val got = nearest(
      pts((7L, 0L, 0L)),
      sts((1L, 1000000L, 1000000L), (2L, 2000000L, 0L)))
    // d2(1) = 2e12, d2(2) = 4e12 → station 1
    assert(got === Seq((7L, Some(1L), Some(2000000000000L), 2L)))
  }

  test("nearestStation: ties break to the lowest station id") {
    val got = nearest(
      pts((1L, 0L, 0L)),
      sts((9L, 1000000L, 0L), (3L, -1000000L, 0L), (5L, 0L, 1000000L)))
    assert(got === Seq((1L, Some(3L), Some(1000000000000L), 3L)))
  }

  test("nearestStation: empty ring preserves the point with nulls") {
    // station 3 cells away (>1 ring) — no candidate
    val got = nearest(pts((1L, 0L, 0L)), sts((1L, 45000000L, 0L)))
    assert(got === Seq((1L, None, None, 0L)))
  }

  test("nearestStation: longitude ring and distance wrap at ±180°") {
    // point near +180°, station near −180°: 0.4° apart across the seam
    val got = nearest(
      pts((1L, 0L, 179800000L)),
      sts((4L, 0L, -179800000L)))
    assert(got === Seq((1L, Some(4L), Some(400000L * 400000L), 1L)))
  }

  test("cellOf rejects a cell width that does not divide 360 degrees") {
    intercept[IllegalArgumentException] {
      Spatial.cellOf(lit(0L), lit(0L), 7000000L)
    }
    // and one that leaves < 3 longitude cells (wrap offsets collapse)
    intercept[IllegalArgumentException] {
      Spatial.cellOf(lit(0L), lit(0L), 180000000L)
    }
  }

  test("CosQ: fixed-point cos table endpoints, monotone, 60° exact") {
    assert(Spatial.CosQ.length === 91)
    assert(Spatial.CosQ(0) === 1048576L)  // equator unscaled
    assert(Spatial.CosQ(60) === 524288L)  // cos 60° = 1/2 exactly
    assert(Spatial.CosQ(90) === 0L)
    assert(Spatial.CosQ.toSeq === Spatial.CosQ.toSeq.sorted.reverse)
  }

  test("dist2 scales longitude by cos(lat): lat-60 nearest is correct") {
    // at lat 60° a station 0.5° east is ~28 km away, one 0.4° south is
    // ~44 km; the pre-fix unscaled metric ranked them 2.5e11 vs
    // 1.6e11 and picked the SOUTH one — the scaled metric must pick
    // east: dlon_eff = 500000·CosQ(60)/2^20 = 250000 → d2 = 6.25e10
    val got = nearest(
      pts((1L, 60000000L, 0L)),
      sts((1L, 60000000L, 500000L), (2L, 59600000L, 0L)))
    assert(got === Seq((1L, Some(1L), Some(62500000000L), 2L)))
  }

  test("epsCellMicro: finest ladder rung covering eps") {
    assert(Spatial.epsCellMicro(1L) === 100000L)
    assert(Spatial.epsCellMicro(12000L) === 100000L)
    assert(Spatial.epsCellMicro(100000L) === 100000L)
    assert(Spatial.epsCellMicro(100001L) === 200000L)
    assert(Spatial.epsCellMicro(999999999L) === 10000000L) // coarsest
  }

  test("near-pole full-circle ring probes each column exactly once") {
    // at lat 89.95° the coverage bound saturates (cq = 0 → full
    // circle); both stations sit in the same lat row at opposite
    // longitudes and each must be counted ONCE (offsets 0..nlon−1,
    // not a wrapped double-count)
    val got = Spatial.nearestStation(
      pts((1L, 89950000L, 0L)), "pid", "plat", "plon",
      sts((7L, 89940000L, 90000000L), (8L, 89940000L, -90000000L)),
      "sid", "slat", "slon", 100000L)
      .orderBy("pid")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(got.head._4 === 2L) // n_cand: each station exactly once
    assert(got.head._2 === Some(7L)) // equal d2 → lowest id
  }

  test("kNearestStations: rank by (d2, id), cap at k, empty ring") {
    val p = pts((1L, 0L, 0L), (2L, 80000000L, 0L))
    val s = sts((9L, 1000000L, 0L), (3L, -1000000L, 0L),
      (5L, 2000000L, 0L), (7L, 3000000L, 0L))
    val got = Spatial.kNearestStations(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", Cell, kNearest = 3)
      .orderBy("pid", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // d2 ties at 1e12 break to the lower id (3 before 9); k caps at 3
    // so station 7 is cut; point 2 has an empty ring -> no rows
    assert(got === Seq(
      (1L, 3L, 1000000000000L, 1L),
      (1L, 9L, 1000000000000L, 2L),
      (1L, 5L, 4000000000000L, 3L)))
  }

  test("stationsWithinMeters: geodesic gate; planet radius rejected") {
    val p = pts((1L, 0L, 0L))
    // 0.009 deg E = 1000.75 m (outside 1 km), 0.0089 deg E = 989.6 m
    val s = sts((4L, 0L, 9000L), (6L, 0L, 8900L), (8L, 40000000L, 0L))
    val got = Spatial.stationsWithinMeters(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", radiusMeters = 1000.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 6L)))
    assert(math.abs(got.head._3 - 989.634) < 0.05)
    intercept[IllegalArgumentException] {
      Spatial.stationsWithinMeters(p, "pid", "plat", "plon",
        s, "sid", "slat", "slon", radiusMeters = 2000000.0)
    }
  }

  test("stationsWithinMeters polar cap: over-the-pole in-radius " +
      "stations survive the pre-gate (dlat-only in the cap)") {
    // (86.5°, 0°) to (86.5°, 180°) is 778.4 km OVER THE POLE — true
    // in-radius at 800 km — but measures ~9.42e6 scaled micro along
    // the parallel, beyond the 9.36e6 pre-gate: the equirect dlon
    // term is inadmissible in the cap and must be skipped there
    val p = pts((1L, 86500000L, 0L))
    val s = sts(
      (2L, 86500000L, -180000000L), // 778.4 km over the pole: IN
      (3L, 88000000L, -180000000L), // 611.6 km over the pole: IN
      (4L, 86500000L, 179000000L),  // 778.7 km, near-antipodal: IN
      (5L, 82000000L, -180000000L)) // 1279 km over the pole: OUT
    val got = Spatial.stationsWithinMeters(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", radiusMeters = 800000.0)
      .orderBy("station")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(2L, 3L, 4L))
    assert(math.abs(got.head._3 - 778364.2) < 1.0)
    // and a non-cap pair is still gated by the full scaled metric:
    // same geometry at lat 40° is ~12,000 km apart — absent
    val pLow = pts((9L, 40000000L, 0L))
    val sLow = sts((10L, 40000000L, 180000000L))
    assert(Spatial.stationsWithinMeters(pLow, "pid", "plat", "plon",
      sLow, "sid", "slat", "slon", radiusMeters = 800000.0)
      .count() === 0L)
  }

  test("nearDupPointsVerified: geodesic gate, polar seam, mm rounding") {
    // equator: 0.009°E is 1000.75 m — OUTSIDE the 1 km gate even
    // though the scaled pre-gate (9000 ≤ 12000) admits it; 0.0089°E
    // is 989.63 m — inside, with the true metres reported
    val eq = Spatial.nearDupPointsVerified(
      pts((1L, 0L, 0L), (2L, 0L, 9000L), (3L, 10000000L, 10000000L)),
      "pid", "plat", "plon", pregateMicro = 12000L, epsMeters = 1000.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(eq.isEmpty)
    val eq2 = Spatial.nearDupPointsVerified(
      pts((1L, 0L, 0L), (2L, 0L, 8900L)),
      "pid", "plat", "plon", pregateMicro = 12000L, epsMeters = 1000.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(eq2.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(math.abs(eq2.head._3 - 989.634) < 0.05)
    // polar seam: 2° of raw longitude at lat 89.95° is ~194 m of true
    // distance ACROSS the ±180° seam — the full-circle ring + the
    // admissible pre-gate (band cos underestimates, never drops a
    // true pair) must surface it; a 100 m gate must reject it
    val pole = pts((1L, 89950000L, 179000000L),
      (2L, 89950000L, -179000000L))
    val found = Spatial.nearDupPointsVerified(pole, "pid", "plat",
      "plon", pregateMicro = 12000L, epsMeters = 1000.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(found.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(math.abs(found.head._3 - 194.1) < 0.5)
    val strict = Spatial.nearDupPointsVerified(pole, "pid", "plat",
      "plon", pregateMicro = 12000L, epsMeters = 100.0)
      .collect()
    assert(strict.isEmpty)
    // pregate must fit inside the eps-matched cell
    intercept[IllegalArgumentException] {
      Spatial.nearDupPointsVerified(pole, "pid", "plat", "plon",
        pregateMicro = 200001L, epsMeters = 1.0,
        cellMicroOpt = Some(200000L))
    }
  }

  test("idwEstimate: coincident station dominates; equidistant average") {
    val p = pts((1L, 0L, 0L), (2L, 50000000L, 50000000L))
    // station 10 sits ON point 1 (its only candidate, weight 1e18);
    // stations 20/21 are equidistant from point 2 and its only
    // candidates → exact mean of their values
    val s = Seq(
      (10L, 0L, 0L, 700L),
      (20L, 49000000L, 50000000L, 100L),
      (21L, 51000000L, 50000000L, 300L)).toDF("sid", "slat", "slon", "vc")
    val got = Spatial.idwEstimate(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", col("vc"), Cell)
      .orderBy("pid")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 1L, Some(7.0)),   // d2=0 sole candidate: exact value
      (2L, 2L, Some(2.0)))) // equal weights: exact (100+300)/2 cents
  }

  test("idwEstimateKnn: only the k nearest stations contribute") {
    val p = pts((1L, 0L, 0L))
    val s = Seq((1L, 1000000L, 0L, 100L), (2L, 2000000L, 0L, 200L),
      (3L, 3000000L, 0L, 900L)).toDF("sid", "slat", "slon", "vc")
    val knn = Spatial.idwEstimateKnn(p, "pid", "plat", "plon",
      s, "sid", "slat", "slon", col("vc"), Cell, kNearest = 2)
      .as[(Long, Long, Option[Double])].collect().toSeq
    // identical to all-ring IDW over just the two nearest stations
    val two = Spatial.idwEstimate(p, "pid", "plat", "plon",
      s.where(col("sid") =!= 3L), "sid", "slat", "slon", col("vc"),
      Cell).as[(Long, Long, Option[Double])].collect().toSeq
    assert(knn === two)
    assert(knn.head._2 === 2L) // n_cand = stations actually used
  }

  test("idwEstimate: empty ring yields null estimate, n_cand 0") {
    val got = Spatial.idwEstimate(pts((1L, 0L, 0L)), "pid", "plat",
      "plon", Seq((1L, 80000000L, 0L, 5L)).toDF("sid", "slat", "slon", "vc"),
      "sid", "slat", "slon", col("vc"), Cell)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 0L, None)))
  }

  test("autoCellMicro: rung thresholds match the oracle gates") {
    // thresholds are ceil(target·cells(w)/9) per rung; the q271 oracle
    // inlines 2304/3600 — this pins the Scala rule to those literals
    assert(Spatial.autoCellMicro(1L) === 10000000L)
    assert(Spatial.autoCellMicro(2303L) === 10000000L)
    assert(Spatial.autoCellMicro(2304L) === 5000000L)
    assert(Spatial.autoCellMicro(3599L) === 5000000L)
    assert(Spatial.autoCellMicro(3600L) === 4000000L)
    assert(Spatial.autoCellMicro(6400L) === 3000000L)
    assert(Spatial.autoCellMicro(14400L) === 2000000L)
    assert(Spatial.autoCellMicro(57600L) === 1000000L)
    assert(Spatial.autoCellMicro(230400L) === 500000L)
    assert(Spatial.autoCellMicro(1440000L) === 200000L)
    assert(Spatial.autoCellMicro(5760000L) === 100000L)
    // width never grows with density
    val ws = Seq(10L, 100L, 1000L, 10000L, 100000L, 1000000L, 10000000L)
      .map(Spatial.autoCellMicro(_))
    assert(ws === ws.sorted.reverse)
  }

  test("gridClusters: neighbor merge, wrap merge, noise, singleton") {
    // cells (9,0) and (9,35): dense, lon-adjacent by wrap → one
    // cluster, rep = min row-major index 9·36+0 = 324; cell (12,18):
    // dense but isolated → singleton 12·36+18 = 450; cell (0,18):
    // one point → noise
    val p = pts(
      (1L, 1000000L, -179000000L), (2L, 2000000L, -178000000L), // (9,0)
      (3L, 1000000L, 175000000L), (4L, 2000000L, 176000000L),   // (9,35)
      (5L, 35000000L, 1000000L), (6L, 36000000L, 2000000L),     // (12,18)
      (7L, -85000000L, 0L))                                     // (0,18)
    val got = Spatial.gridClusters(p, "pid", "plat", "plon", Cell,
      minPts = 2L).orderBy("pid")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 9L, 0L, Some(324L)), (2L, 9L, 0L, Some(324L)),
      (3L, 9L, 35L, Some(324L)), (4L, 9L, 35L, Some(324L)),
      (5L, 12L, 18L, Some(450L)), (6L, 12L, 18L, Some(450L)),
      (7L, 0L, 18L, None)))
  }

  test("ring joins compile to equi-joins — no BNLJ, no cartesian") {
    val p = pts((1L, 0L, 0L), (2L, 5000000L, 5000000L))
    val s = sts((1L, 1000000L, 1000000L), (2L, 40000000L, 0L))
    val plans = Seq(
      Spatial.nearestStation(p, "pid", "plat", "plon",
        s, "sid", "slat", "slon", Cell),
      Spatial.nearDupPoints(p, "pid", "plat", "plon", Cell, 10000L),
      Spatial.gridClusters(p, "pid", "plat", "plon", Cell, 2L))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { ph =>
      assert(!ph.contains("BroadcastNestedLoopJoin"), ph.take(400))
      assert(!ph.contains("CartesianProduct"), ph.take(400))
    }
  }

  test("nearDupPoints: inclusive eps, wrap pair, no self/far pairs") {
    val p = pts(
      (1L, 0L, 0L), (2L, 3000L, 4000L),      // d = 5000 exactly
      (3L, 0L, 179999000L), (4L, 0L, -179999000L), // 2000 across seam
      (5L, 20000000L, 0L))                   // far from everything
    val got = Spatial.nearDupPoints(p, "pid", "plat", "plon", Cell,
      epsMicro = 5000L)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 25000000L),   // 3000² + 4000² = 5000² — inclusive
      (3L, 4L, 4000000L)))   // wrapped distance 2000²
    intercept[IllegalArgumentException] {
      Spatial.nearDupPoints(p, "pid", "plat", "plon", Cell,
        epsMicro = Cell + 1)
    }
  }

  test("hotSpots: local ring mean vs global mean, cross-multiplied") {
    // ten isolated cold cells (value 0) + one dense cell with two
    // points of 1000: ring mean 1000 vs global mean 2000/12 → hot;
    // cold rings are 0 → not hot
    def center(k: Long, lonCell: Long) =
      (k * 10000000L - 90000000L + 5000000L,
        lonCell * 10000000L - 180000000L + 5000000L)
    val cold = for (k <- Seq(0L, 2L, 4L, 6L, 8L); lc <- Seq(0L, 18L))
      yield { val (la, lo) = center(k, lc); (la, lo, 0L) }
    val (ha, ho) = center(12L, 18L)
    val all = (cold ++ Seq((ha, ho, 1000L), (ha + 1L, ho + 1L, 1000L)))
      .toDF("plat", "plon", "v")
    val got = Spatial.hotSpots(all, "plat", "plon", col("v"), Cell)
      .orderBy("cell_lat", "cell_lon")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got.size === 11)
    val hot = got.filter(_._7)
    assert(hot === Seq((12L, 18L, 2L, 2000L, 2L, 2000L, true)))
  }

  test("blockSplit: same cell always same split; percents validated") {
    // many points across many cells: every cell maps to exactly one
    // split, and the assignment is stable across invocations
    val p = pts((1L to 200L).map(i =>
      (i, (i % 17) * 10000000L - 80000000L,
        (i % 36) * 10000000L - 180000000L)): _*)
    val df = Spatial.blockSplit(p, "pid", "plat", "plon", Cell)
    val perCell = df.groupBy("cell_lat", "cell_lon")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).collect()(0).getLong(0)
    assert(perCell === 1L)
    val again = Spatial.blockSplit(p, "pid", "plat", "plon", Cell)
      .orderBy("pid").collect().toSeq
    assert(df.orderBy("pid").collect().toSeq === again)
    val splits = df.select("split").distinct()
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
    intercept[IllegalArgumentException] {
      Spatial.blockSplit(p, "pid", "plat", "plon", Cell, 60L, 40L)
    }
  }

  test("ringDensity: own cell included, neighbors summed, lon wraps") {
    // three points: two in cell (9,0) (lon near −180°), one in cell
    // (9,35) (lon near +180°) — lon-adjacent by wrap; a station in (9,0)
    val p = pts((1L, 1000000L, -179000000L), (2L, 2000000L, -178000000L),
      (3L, 1000000L, 175000000L))
    val s = sts((1L, 500000L, -179500000L))
    val got = Spatial.ringDensity(p, "plat", "plon", s, "slat", "slon",
      Cell).orderBy("cell_lat", "cell_lon")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (9L, 0L, 2L, 1L, 3L),  // own 2 + wrapped neighbor 1
      (9L, 35L, 1L, 0L, 3L)))
  }
}
