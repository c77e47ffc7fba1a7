package graft

import org.apache.spark.sql.functions._
import graft.analytics.Histograms

/** Histogram semantics: bucket assignment edges, depth balance,
  * partitioning-insensitivity, degenerate inputs. */
class HistogramsSpec extends SparkSpec {
  import spark.implicits._

  test("equiWidth: hand-computed buckets, max lands in the top bucket") {
    // values 0..10 over [0,10], k=5 -> width 2
    val df = (0 to 10).map(_.toDouble).toDF("x")
    val got = Histograms.equiWidth(df, $"x", 5)
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (0, 0.0, 2.0, 2L), // 0,1
      (1, 2.0, 4.0, 2L), // 2,3
      (2, 4.0, 6.0, 2L), // 4,5
      (3, 6.0, 8.0, 2L), // 6,7
      (4, 8.0, 10.0, 3L) // 8,9,10 (max closed into top bucket)
    ))
  }

  test("equiWidth: constant column degenerates to one bucket") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val got = Histograms.equiWidth(df, $"x", 4).collect()
    assert(got.length == 1 && got(0).getInt(0) == 0 &&
      got(0).getLong(3) == 3L)
  }

  test("equiDepth: counts are balanced on a uniform column") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val got = Histograms.equiDepth(df, $"x", 10)
      .orderBy("bucket").collect()
    assert(got.length == 10)
    got.foreach(r => assert(math.abs(r.getLong(3) - 100L) <= 1,
      s"unbalanced bucket: $r"))
    // edges tile [min, max]
    assert(got.head.getDouble(1) == 1.0 && got.last.getDouble(2) == 1000.0)
  }

  test("equiDepth: boundary ties go to the lower bucket") {
    // half the rows are exactly the median value
    val df = (Seq.fill(10)(1.0) ++ Seq.fill(10)(2.0)).toDF("x")
    val got = Histograms.equiDepth(df, $"x", 2)
      .orderBy("bucket").collect()
    // median interpolates to 1.5; 1.0s below, 2.0s above
    assert(got.map(r => r.getInt(0) -> r.getLong(3)).toSeq ===
      Seq(0 -> 10L, 1 -> 10L))
  }

  test("clipQuantiles: values clamp to the group's quantile bounds") {
    val df = ((1 to 100).map(i => ("a", i.toDouble)) :+ ("b", 5.0))
      .toDF("g", "x")
    val got = Histograms.clipQuantiles(df, $"x", Seq("g"), 0.1, 0.9)
    val a = got.where($"g" === "a")
    // p10 of 1..100 = 10.9, p90 = 90.1 (interpolated)
    val bounds = a.select("__p_lo", "__p_hi").distinct().collect()(0)
    assert(math.abs(bounds.getDouble(0) - 10.9) < 1e-9)
    assert(math.abs(bounds.getDouble(1) - 90.1) < 1e-9)
    val clipped = a.select("clipped").collect().map(_.getDouble(0))
    assert(clipped.min == bounds.getDouble(0))
    assert(clipped.max == bounds.getDouble(1))
    assert(clipped.forall(v =>
      v >= bounds.getDouble(0) && v <= bounds.getDouble(1)))
    // singleton group: both quantiles equal the value, nothing clips
    val b = got.where($"g" === "b").collect()(0)
    assert(b.getAs[Double]("clipped") == 5.0)
  }

  test("madOutliers: flags only points beyond k*1.4826*MAD") {
    // group a: values 1..9 plus a wild 1000
    // med of {1..9,1000} = 5.5; dev = {4.5,3.5,...,0.5,0.5,...,994.5}
    // mad = median(dev) = 2.5; threshold 3*1.4826*2.5 = 11.1195
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
      .toDF("g", "x")
    val r = Histograms.madOutliers(df, $"x", Seq("g")).collect()(0)
    assert(r.getAs[Double]("med") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Double]("outlier_ratio") === 0.1)
  }

  test("madOutliers: zero MAD flags every off-median value") {
    val df = (Seq.fill(5)(2.0) :+ 3.0).map(("g", _)).toDF("g", "x")
    val r = Histograms.madOutliers(df, $"x", Seq("g")).collect()(0)
    assert(r.getAs[Double]("mad") === 0.0)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("madOutliers: groups independent, nulls excluded") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(5.0))).toDF("g", "x")
    val got = Histograms.madOutliers(df, $"x", Seq("g"))
      .orderBy("g").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n") === 2L)
    assert(got(1).getAs[Long]("n") === 1L)
    assert(got(1).getAs[Long]("n_outliers") === 0L)
  }

  test("both: nulls excluded, partitioning-insensitive") {
    val df = ((1 to 100).map(i => Some(i.toDouble)) ++
      Seq(None, None)).toDF("x")
    def run(d: org.apache.spark.sql.DataFrame) =
      (Histograms.equiWidth(d, $"x", 7).orderBy("bucket").collect().toSeq,
        Histograms.equiDepth(d, $"x", 7).orderBy("bucket").collect().toSeq)
    val a = run(df.coalesce(1))
    val b = run(df.repartition(9))
    assert(a == b)
    assert(a._1.map(_.getLong(3)).sum == 100L)
    assert(a._2.map(_.getLong(3)).sum == 100L)
  }

  test("fdProfile: clean FD reports zero violations, dirty FD " +
      "counts keys and worst fan-out; nulls assert nothing") {
    val rows = Seq(
      (1L, "a", "x"), (2L, "a", "x"),     // a -> x (clean so far)
      (3L, "b", "x"), (4L, "b", "y"),     // b fans to 2
      (5L, "c", "x"), (6L, "c", "y"), (7L, "c", "z"),  // c fans to 3
      (8L, null, "q"), (9L, "d", null))   // excluded
      .toDF("id", "k", "v")
    val got = Histograms.fdProfile(rows,
        Seq("k" -> "v", "id" -> "k"))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(("k", "v")) === ((3L, 2L, 3L, 2.0 / 3)))
    // id is a key: every id with a non-null k maps to exactly one
    // (row 8 drops for null k; row 9 keeps: only v is null there)
    assert(got(("id", "k")) === ((8L, 0L, 1L, 0.0)))
  }

  test("percentRankNormalize: tie-sharing ranks, per-group range, " +
      "singleton group at 0") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "a", 30L), (5L, "b", 999L))
    val got = Histograms.percentRankNormalize(
        rows.toDF("id", "g", "v"), "g", "v", "id")
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    // group a (n=4): ranks 1,2,2,4 -> pr 0, 1/3, 1/3, 1
    assert(got(1L) === 0.0)
    assert(got(2L) === 1.0 / 3 && got(3L) === 1.0 / 3)
    assert(got(4L) === 1.0)
    assert(got(5L) === 0.0)
  }

  test("hillTailIndex: exact Pareto tail recovers its exponent") {
    // X_(i) = c * i^(-1/a) is an exact Pareto order sequence: the
    // Hill sum telescopes to (1/k)*Σ ln((k+1)/i)/a, whose estimate
    // approaches a as k grows. With a = 2 and k = 200 the bias is
    // under 1%.
    val a = 2.0; val k = 200
    val xs = (1 to 1000).map(i => 1e6 * math.pow(i, -1.0 / a))
    val got = Histograms.hillTailIndex(xs.toDF("x"), col("x"), k)
      .collect()(0)
    assert(got.getLong(0) === k.toLong)
    val alpha = got.getDouble(2)
    assert(math.abs(alpha - a) < 0.05, s"alpha $alpha vs $a")
  }

  test("hillTailIndex: constant tail and short input report null") {
    val const = Histograms.hillTailIndex(
      Seq.fill(50)(7.0).toDF("x"), col("x"), 10).collect()(0)
    assert(const.isNullAt(2) && const.getDouble(1) === 7.0)
    val short = Histograms.hillTailIndex(
      Seq(3.0, 2.0, 1.0).toDF("x"), col("x"), 10).collect()(0)
    assert(short.getLong(0) === 2L && short.isNullAt(2))
  }

  test("hillTailIndex: nulls and non-positives excluded, " +
      "repartition-invariant") {
    val rows = (1 to 500).map(i => Option(
      if (i % 7 == 0) -1.0 else 1000.0 / i)) :+
      Option.empty[Double]
    val base = Histograms.hillTailIndex(
      rows.toDF("x"), col("x"), 50).collect()(0).toSeq
    val shuf = Histograms.hillTailIndex(
      rows.reverse.toDF("x").repartition(13), col("x"), 50)
      .collect()(0).toSeq
    assert(base === shuf)
  }
}
