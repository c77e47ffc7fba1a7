package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analytics.{AsOfJoin, RangeJoin, Suitability}

/** Boundary semantics of the as-of join, range join, and suitability
  * scoring math. */
class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join: inclusive boundary, no-prior nulls, latest wins") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "e1"),
      (1L, ts("2026-01-01 12:00:00"), "e2"),
      (2L, ts("2026-01-01 09:00:00"), "e3")) // user 2 has no quotes
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:30:00"), 100.0),
      (1L, ts("2026-01-01 10:00:00"), 200.0),  // equal-ts: counts (<=)
      (1L, ts("2026-01-01 11:00:00"), 300.0))
      .toDF("user_id", "ts", "quote")
    val got = AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts",
        Seq("quote")).orderBy("tag")
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.get(r.fieldIndex("asof_quote")))))
    assert(got.toSeq == Seq(
      ("e1", Some(200.0)),  // equal timestamp included
      ("e2", Some(300.0)),  // latest prior
      ("e3", None)))        // no prior → null
  }

  test("range join: half-open boundaries, bin edges exact") {
    val points = Seq((1L, 0.0), (2L, 29.999), (3L, 30.0), (4L, 60.0))
      .toDF("id", "v")
    val ivals = Seq(("a", 0.0, 30.0), ("b", 30.0, 60.0), ("c", 25.0, 35.0))
      .toDF("name", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi",
        binWidth = 30.0)
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "c"),
      (3L, "b"), (3L, "c")))
    // 30.0 excluded from a (half-open hi); 60.0 excluded from b
  }

  test("BM25 ranks term-dense docs first; tf-idf discounts common terms") {
    import spark.implicits._
    import graft.analytics.Relevance
    val docs = Seq(
      (1L, "spark shuffle join spark shuffle"),   // both query terms, dense
      (2L, "spark filter scan filter scan scan"), // one query term
      (3L, "the the the the the the"),            // no query terms
      (4L, "spark shuffle"))                      // both terms, short doc
      .toDF("doc_id", "text")
    val queries = Seq((1, "spark shuffle")).toDF("query_id", "text")
    val top = Relevance.bm25TopK(docs, "doc_id", "text", queries, k = 4)
      .orderBy("rn").collect().map(_.getLong(1))
    // docs with both terms outrank the single-term doc; doc 3 never
    // appears (no shared term — inverted index prunes it entirely)
    assert(top.length == 3)
    assert(top.toSet == Set(1L, 2L, 4L))
    assert(top.indexOf(2L) == 2)
    // tf-idf: a corpus-wide term ("spark" in 3/4 docs) weighs less
    // than a rare one ("join" in 1/4) at equal tf
    val w = Relevance.tfidf(docs, "doc_id", "text")
      .filter(col("doc_id") === 1).collect()
      .map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(w("join") > w("spark") / 2) // tf(spark)=2 vs tf(join)=1
    assert(w("join") * 2 > w("spark")) // idf(join) > idf(spark)
  }

  test("k-means codebook separates clusters and is deterministic") {
    import spark.implicits._
    import graft.analytics.Similarity
    // two obvious directional clusters in 4-d; first-2 init starts with
    // one member of each
    val vecs = Seq(
      (0L, Array(1f, 0.1f, 0f, 0f)), (1L, Array(0f, 0.1f, 1f, 0.2f)),
      (2L, Array(0.9f, 0f, 0.1f, 0f)), (3L, Array(0.1f, 0f, 0.9f, 0.1f)),
      (4L, Array(0.95f, 0.05f, 0f, 0.05f)), (5L, Array(0f, 0.2f, 1.1f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
      k = 2, dim = 4, iterations = 3)
    val cents = cb.orderBy("centroid_id").collect()
      .map(r => r.getSeq[Double](1).toArray)
    assert(cents.length == 2)
    // centroid 0 points along dim 1, centroid 1 along dim 3
    assert(cents(0)(0) > cents(0)(2) && cents(1)(2) > cents(1)(0))
    // bit-identical across re-runs (quantized associative sums)
    val again = Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
        k = 2, dim = 4, iterations = 3)
      .orderBy("centroid_id").collect().map(_.getSeq[Double](1).toArray)
    assert(cents.zip(again).forall { case (a, b) => a.sameElements(b) })
    // an unassignable (empty) cell keeps its previous centroid: k=3
    // with only two clusters leaves at least one cell stable
    val cb3 = Similarity.kmeansCodebook(vecs, "vec_id", "embedding",
      k = 3, dim = 4, iterations = 2)
    assert(cb3.count() == 3)
  }

  test("suitability scores: band membership, caps, clamps") {
    assert(eval(Suitability.tempMatch(lit(20.0), lit(15.0), lit(25.0)))
      == 1.0)                                     // at band center
    assert(eval(Suitability.tempMatch(lit(60.0), lit(15.0), lit(25.0)))
      == 0.0)                                     // ≥20°C away → 0
    assert(eval(Suitability.waterAdequacy(lit(99.0), lit(3.0))) == 1.0)
    assert(eval(Suitability.waterAdequacy(lit(1.5), lit(3.0))) == 0.5)
    assert(eval(Suitability.phMatch(lit(6.5), lit(6.0), lit(7.0))) == 1.0)
    assert(eval(Suitability.phMatch(lit(8.0), lit(6.0), lit(7.0))) == 0.5)
    assert(eval(Suitability.phMatch(lit(3.0), lit(6.0), lit(7.0))) == 0.0)
  }

  test("intervalOverlap equals the naive inequality join, exactly once") {
    import spark.implicits._
    // seeded random half-open intervals, lengths 0..40 over [0, 400):
    // spans several bins at width 25, so multi-bin pairs exercise the
    // claim-bin dedup rule
    val rnd = new scala.util.Random(11)
    val as = (0L until 60L).map { i =>
      val lo = rnd.nextInt(400).toDouble
      (i, lo, lo + rnd.nextInt(41)) }.toDF("aid", "alo", "ahi")
    val bs = (0L until 50L).map { i =>
      val lo = rnd.nextInt(400).toDouble
      (i, lo, lo + rnd.nextInt(41)) }.toDF("bid", "blo", "bhi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("aid", "bid").orderBy("aid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val binned = canon(RangeJoin.intervalOverlap(
      as, bs, "alo", "ahi", "blo", "bhi", binWidth = 25.0))
    val naive = canon(as.crossJoin(bs)
      .filter(col("alo") < col("bhi") && col("blo") < col("ahi")))
    assert(binned === naive)
    assert(naive.nonEmpty)
    // exactly-once: no pair may surface from two shared bins
    assert(binned.distinct === binned)
    // partitioning-insensitive
    assert(canon(RangeJoin.intervalOverlap(as.repartition(7),
      bs.repartition(3), "alo", "ahi", "blo", "bhi", 25.0)) === binned)
  }

  test("ewmaFold: hand-computed recursion, single element, null/empty") {
    import graft.analytics.TimeSeries
    def f(vs: Seq[Double]): Any =
      Seq(vs).toDF("v")
        .select(TimeSeries.ewmaFold(col("v"), 0.25).as("e"))
        .collect()(0).get(0)
    // 10, 20, 40 → 10; 0.25·20+0.75·10 = 12.5; 0.25·40+0.75·12.5 = 19.375
    assert(f(Seq(10.0, 20.0, 40.0)) === 19.375)
    assert(f(Seq(7.5)) === 7.5)
    assert(f(Seq.empty) === null)
  }
}
