package graft

import org.apache.spark.sql.functions._
import graft.analytics.Spatial

/** Property armor for the spatial tier's two central claims, checked
  * against brute force on seeded random corpora that deliberately
  * cover high latitudes and the ±180° seam:
  *
  *  1. RING COVERAGE: for every point whose true (scaled-metric)
  *     nearest station is within one cell width, [[Spatial.nearestStation]]
  *     returns exactly the brute-force argmin — the per-latitude lon
  *     half-width bound is EXACT, not heuristic.
  *  2. ADMISSIBLE REFINE: [[Spatial.nearDupPointsVerified]] finds
  *     EVERY pair within the geodesic gate whose pre-gate is sized by
  *     the documented rule — the bandShift=1 metric never
  *     overestimates, so filter-and-refine loses nothing.
  */
class SpatialPropsSpec extends SparkSpec {
  import spark.implicits._

  // seeded, latitude-stratified random coordinates: uniform lon,
  // lat mixed uniform + polar-concentrated (the regime the cos
  // scaling exists for)
  private def randomCoords(seed: Long, n: Int): Seq[(Long, Long, Long)] = {
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      val lat =
        if (i % 4 == 0) // polar band ±[80°, 90°]
          (80000000L + r.nextInt(10000001).toLong) *
            (if (r.nextBoolean()) 1L else -1L)
        else r.nextLong(180000001L) - 90000000L
      val lon = r.nextLong(360000000L) - 180000000L
      (i.toLong, lat, lon)
    }
  }

  private def bruteNearest(pts: Seq[(Long, Long, Long)],
      sts: Seq[(Long, Long, Long)], cell: Long): Map[Long, (Long, Long)] = {
    // the same scaled metric, evaluated exhaustively in Scala
    def d2(plat: Long, plon: Long, slat: Long, slon: Long): Long = {
      val dlat = plat - slat
      val raw = math.abs(plon - slon)
      val dlon = math.min(raw, 360000000L - raw)
      val band = math.min(90L, math.abs(plat + slat) / 2000000L)
      val dle = dlon * Spatial.CosQ(band.toInt) / Spatial.CosScale
      dlat * dlat + dle * dle
    }
    pts.map { case (pid, plat, plon) =>
      val best = sts.map { case (sid, slat, slon) =>
        (d2(plat, plon, slat, slon), sid)
      }.min
      pid -> (best._2, best._1)
    }.toMap
  }

  test("ring coverage is exact: within one cell width the ring argmin " +
      "equals brute force, at every latitude and ladder rung") {
    for ((seed, cell) <- Seq((7L, 10000000L), (11L, 2000000L),
        (13L, 500000L))) {
      val ptsSeq = randomCoords(seed, 60)
      // random far stations + stations PLANTED within half a cell of
      // a sample of points, so the in-contract regime is populated at
      // every rung (globally random stations never land within 0.5°)
      val jit = new scala.util.Random(seed + 5)
      val half = (cell / 2).toInt
      val planted = ptsSeq.take(20).map { case (i, la, lo) =>
        val lat = math.max(-90000000L, math.min(90000000L,
          la + jit.nextInt(2 * half + 1) - half))
        val lon = ((lo + jit.nextInt(2 * half + 1) - half +
          540000000L) % 360000000L) - 180000000L
        (i + 500L, lat, lon)
      }
      val stsSeq = randomCoords(seed + 1000, 40)
        .map { case (i, la, lo) => (i + 100L, la, lo) } ++ planted
      val got = Spatial.nearestStation(
        ptsSeq.toDF("pid", "plat", "plon"), "pid", "plat", "plon",
        stsSeq.toDF("sid", "slat", "slon"), "sid", "slat", "slon",
        cell)
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
      val brute = bruteNearest(ptsSeq, stsSeq, cell)
      val lim = cell * cell
      var covered = 0
      ptsSeq.foreach { case (pid, _, _) =>
        val (bSid, bD2) = brute(pid)
        if (bD2 <= lim) {
          covered += 1
          assert(got(pid) === ((Some(bSid), Some(bD2))),
            s"seed=$seed cell=$cell point $pid: ring missed the " +
              s"in-contract nearest (brute=($bSid,$bD2), got=${got(pid)})")
        } else got(pid)._2.foreach { d =>
          // outside the contract the ring may return a candidate,
          // but never a BETTER-than-brute one (it is a subset)
          assert(d >= bD2)
        }
      }
      assert(covered > 0, s"seed=$seed cell=$cell: vacuous run")
    }
  }

  test("admissible pre-gate loses no geodesic pair: verified dedup " +
      "equals brute-force haversine within the gate") {
    val r = new scala.util.Random(42L)
    // clusters of jittered points (including polar and seam anchors)
    // so true sub-km pairs exist at hard latitudes
    val anchors = Seq((0L, 0L), (60000000L, 10000000L),
      (89900000L, 179950000L), (-85000000L, -179990000L),
      (45000000L, 179999000L))
    val ptsSeq = anchors.zipWithIndex.flatMap { case ((la, lo), a) =>
      (0 until 6).map { j =>
        val lat = math.max(-90000000L, math.min(90000000L,
          la + r.nextInt(20001) - 10000L))
        val lon = ((lo + r.nextInt(20001) - 10000L + 540000000L) %
          360000000L) - 180000000L
        ((a * 10 + j).toLong, lat, lon)
      }
    }
    val eps = 1000.0
    val pregate = Spatial.radiusPregateMicro(eps)
    val got = Spatial.nearDupPointsVerified(
      ptsSeq.toDF("pid", "plat", "plon"), "pid", "plat", "plon",
      pregateMicro = pregate, epsMeters = eps)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: every pair, exact haversine (same formula order)
    def hav(a: (Long, Long, Long), b: (Long, Long, Long)): Double = {
      val sdLat = math.sin(math.toRadians((b._2 - a._2) / 2000000.0))
      val sdLon = math.sin(math.toRadians((b._3 - a._3) / 2000000.0))
      val h = sdLat * sdLat +
        math.cos(math.toRadians(a._2 / 1000000.0)) *
          math.cos(math.toRadians(b._2 / 1000000.0)) * sdLon * sdLon
      2.0 * Spatial.EarthRadiusM * math.asin(math.sqrt(h))
    }
    val brute = (for {
      a <- ptsSeq; b <- ptsSeq if a._1 < b._1
      d = hav(a, b)
      if BigDecimal(d).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble <= eps
    } yield (a._1, b._1)).toSet
    assert(brute.nonEmpty, "vacuous: no true sub-km pairs generated")
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }
}
