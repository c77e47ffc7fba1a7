package graft

import graft.analytics.EmbeddingStats

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupStats: identical vectors have zero dispersion") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)), (1L, Seq(3.0f, 4.0f)))
      .toDF("label", "embedding")
    val r = EmbeddingStats.groupStats(df, "label", "embedding")
      .collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    // ||(3,4)|| = 5, up to the 2^-20 fixed-point floor
    assert(math.abs(r.getAs[Double]("centroid_norm") - 5.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("avg_sq_dist")) < 1e-9)
  }

  test("groupStats: symmetric pair centers at the midpoint") {
    // (1,0) and (-1,0): centroid (0,0), avg sq dist 1
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.0f)))
      .toDF("label", "embedding")
    val r = EmbeddingStats.groupStats(df, "label", "embedding")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("centroid_norm")) < 1e-5)
    assert(math.abs(r.getAs[Double]("avg_sq_dist") - 1.0) < 1e-5)
  }

  test("groupStats: groups are independent and ordered") {
    val df = Seq(
      (2L, Seq(1.0f)), (1L, Seq(2.0f)), (1L, Seq(2.0f)))
      .toDF("label", "embedding")
    val got = EmbeddingStats.groupStats(df, "label", "embedding")
      .select("label", "n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("groupStats: null vectors are excluded") {
    val df = Seq((1L, Some(Seq(1.0f))), (1L, None))
      .toDF("label", "embedding")
    val r = EmbeddingStats.groupStats(df, "label", "embedding")
      .collect()(0)
    assert(r.getAs[Long]("n") === 1L)
  }

  test("centroidSeparation: hand-computed two-cluster geometry") {
    // label 1 centered at (0,0) with dispersion 1 (pair +-1 on x);
    // label 2 centered at (10,0) with dispersion 1; label 3 one
    // point at (0,3) -> dispersion 0
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.0f)),
      (2L, Seq(11.0f, 0.0f)), (2L, Seq(9.0f, 0.0f)),
      (3L, Seq(0.0f, 3.0f)))
      .toDF("label", "embedding")
    val got = EmbeddingStats.centroidSeparation(df, "label", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    val (d12, s12) = got((1L, 2L))
    assert(math.abs(d12 - 10.0) < 1e-5)
    assert(math.abs(s12.get - 100.0 / 2) < 1e-3)
    val (d13, s13) = got((1L, 3L))
    assert(math.abs(d13 - 3.0) < 1e-5)
    assert(math.abs(s13.get - 9.0) < 1e-3)
    val (d23, _) = got((2L, 3L))
    assert(math.abs(d23 - math.sqrt(109.0)) < 1e-4)
    assert(got.size === 3)
  }

  test("qualityGate: each defect class counted once, healthy norm " +
      "envelope exact") {
    val rows = Seq(
      Option(Seq(1.0f, 0.0f)),                  // healthy, norm2 2^40
      Option(Seq(0.5f, 0.5f)),                  // healthy
      Option(Seq(0.0f, 0.0f)),                  // zero-norm
      Option(Seq(Float.NaN, 1.0f)),             // non-finite
      Option(Seq(Float.PositiveInfinity, 0f)),  // non-finite
      Option(Seq(1.0f, 2.0f, 3.0f)),            // wrong dim
      Option.empty[Seq[Float]])                 // null
    val got = EmbeddingStats.qualityGate(
      rows.toDF("embedding"), "embedding", expectedDim = 2)
      .collect()(0)
    assert(got.getLong(0) === 7L)
    assert(got.getLong(1) === 1L) // null
    assert(got.getLong(2) === 1L) // wrong dim
    assert(got.getLong(3) === 2L) // non-finite
    assert(got.getLong(4) === 1L) // zero
    // fx(1.0)=2^20 -> norm2 2^40; fx(0.5)=2^19 -> 2*2^38 = 2^39
    assert(got.getLong(5) === 0L)
    assert(got.getLong(6) === (1L << 40))
  }

  test("pcaTopComponent: rank-1 cloud recovers the exact axis, " +
      "eigenvalue and explained ratio") {
    import spark.implicits._
    // points on the line y = 2x, mean zero: Cov = [[2.5, 5], [5, 10]]
    // -> rank 1, top eigenvalue 12.5, direction (1, 2)/sqrt(5),
    // explained = 1. All coordinates are exact 2^-20 multiples, so
    // quantization is lossless and the answer is closed-form.
    val rows = Seq(
      Seq(1.0f, 2.0f), Seq(2.0f, 4.0f),
      Seq(-1.0f, -2.0f), Seq(-2.0f, -4.0f)).toDF("embedding")
    val got = EmbeddingStats.pcaTopComponent(rows, "embedding",
        dim = 2, iterations = 12)
      .orderBy("dim_idx").collect()
    assert(got.length === 2)
    val r0 = got(0)
    assert(r0.getAs[Double]("mu") === 0.0)
    assert(math.abs(r0.getAs[Double]("variance") - 2.5) < 1e-9)
    assert(math.abs(got(1).getAs[Double]("variance") - 10.0) < 1e-9)
    assert(math.abs(r0.getAs[Double]("loading") - 1.0 / math.sqrt(5.0))
      < 1e-9)
    assert(math.abs(got(1).getAs[Double]("loading")
      - 2.0 / math.sqrt(5.0)) < 1e-9)
    assert(math.abs(r0.getAs[Double]("eigenvalue") - 12.5) < 1e-9)
    assert(math.abs(r0.getAs[Double]("explained") - 1.0) < 1e-9)
  }

  test("pcaTopComponent: sign canonicalization and partition " +
      "independence") {
    import spark.implicits._
    // dominant axis along -e2: the canonical form flips it positive
    val rows = Seq(
      Seq(0.25f, -1.0f), Seq(-0.25f, 1.0f),
      Seq(0.5f, -2.0f), Seq(-0.5f, 2.0f)).toDF("embedding")
    val a = EmbeddingStats.pcaTopComponent(rows, "embedding",
      dim = 2, iterations = 12).orderBy("dim_idx").collect()
    assert(a(1).getAs[Double]("loading") > 0.9) // flipped positive
    // identical output (bit-exact doubles) under a different layout
    val b = EmbeddingStats.pcaTopComponent(rows.repartition(7),
        "embedding", dim = 2, iterations = 12)
      .orderBy("dim_idx").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("pcaTopComponents: deflation recovers both axes of an " +
      "axis-aligned cloud, cumulative explained reaches 1") {
    import spark.implicits._
    // independent axes: (±3, 0) and (0, ±2) -> Cov = diag(4.5, 2)
    val rows = Seq(
      Seq(3.0f, 0.0f), Seq(-3.0f, 0.0f),
      Seq(0.0f, 2.0f), Seq(0.0f, -2.0f)).toDF("embedding")
    val got = EmbeddingStats.pcaTopComponents(rows, "embedding",
        dim = 2, nComponents = 2, iterations = 12)
      .orderBy("component", "dim_idx").collect()
    assert(got.length === 4)
    val c1 = got.filter(_.getAs[Long]("component") == 1L)
    val c2 = got.filter(_.getAs[Long]("component") == 2L)
    // 12 iterations at eigengap 4.5:2 converge to ~(2/4.5)^12 ≈ 6e-5
    // in the iterate; the spec checks math, the oracle checks parity
    assert(math.abs(c1(0).getAs[Double]("eigenvalue") - 4.5) < 1e-6)
    assert(math.abs(c1(0).getAs[Double]("loading") - 1.0) < 1e-4)
    assert(math.abs(c1(1).getAs[Double]("loading")) < 1e-3)
    assert(math.abs(c2(0).getAs[Double]("eigenvalue") - 2.0) < 1e-6)
    assert(math.abs(c2(1).getAs[Double]("loading") - 1.0) < 1e-4)
    assert(math.abs(c1(0).getAs[Double]("explained") - 4.5 / 6.5)
      < 1e-6)
    assert(math.abs(c2(0).getAs[Double]("cum_explained") - 1.0) < 1e-6)
  }

  test("distanceConcentration: hand-computed stats over a 3-point " +
      "sample, partition independence") {
    import spark.implicits._
    // right triangle (0,0), (3,0), (0,4): distances 3, 4, 5
    // mean 4, var ((1)+(0)+(1))/3 = 2/3
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)),
      (3L, Seq(0.0f, 4.0f))).toDF("vec_id", "embedding")
    val got = EmbeddingStats.distanceConcentration(rows, "vec_id",
      "embedding", dim = 2, k = 8).collect()(0)
    assert(got.getAs[Long]("n_sample") === 3L)
    assert(got.getAs[Long]("n_pairs") === 3L)
    assert(math.abs(got.getAs[Double]("mean_dist") - 4.0) < 1e-12)
    assert(math.abs(got.getAs[Double]("std_dist")
      - math.sqrt(2.0 / 3.0)) < 1e-12)
    assert(got.getAs[Double]("min_dist") === 3.0)
    assert(got.getAs[Double]("max_dist") === 5.0)
    val b = EmbeddingStats.distanceConcentration(rows.repartition(5),
      "vec_id", "embedding", dim = 2, k = 8).collect()(0)
    assert(got.toSeq === b.toSeq)
  }

  test("distanceConcentration: k caps the sample deterministically " +
      "by (hash, id) order") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      (i, Seq(i.toFloat, (i * 2).toFloat))).toDF("vec_id", "embedding")
    val got = EmbeddingStats.distanceConcentration(rows, "vec_id",
      "embedding", dim = 2, k = 8).collect()(0)
    assert(got.getAs[Long]("n_sample") === 8L)
    assert(got.getAs[Long]("n_pairs") === 28L)
    // collinear points: every distance is sqrt(5)·|i-j| along one
    // axis, so contrast is positive and min < max
    assert(got.getAs[Double]("min_dist") < got.getAs[Double]("max_dist"))
  }
}
