package graft

import org.apache.spark.sql.functions._
import graft.analytics.Dedup

/** Pins the `Dedup.nearDups(strategy = "auto")` tier switchovers —
  * the consumer entry point must route exact / lsh / simhash on the
  * documented conf thresholds, emit the uniform (id_a, id_b, score,
  * method) schema on every tier, and honor explicit overrides. The
  * confs are reset after each test so the suite leaves the session
  * at defaults. */
class NearDupsAutoSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content entirely unrelated"),
    (4L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  private val ConfKeys = Seq(
    "spark.graft.nearDupsExactMaxDocs",
    "spark.graft.nearDupsExactMaxDf2",
    "spark.graft.nearDupsSimhashMinThreshold")

  private def withConf(kv: (String, String)*)(body: => Unit): Unit =
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally ConfKeys.foreach(spark.conf.unset)

  private def methods(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("method").distinct().as[String].collect().toSet

  test("uniform schema on every tier") {
    for (s <- Seq("exact", "lsh", "simhash")) {
      val out = Dedup.nearDups(docs, "doc_id", "text",
        threshold = 0.5, strategy = s)
      assert(out.columns.toSeq === Seq("id_a", "id_b", "score", "method"),
        s"tier $s schema")
    }
  }

  test("auto: small corpus under the df2 budget routes exact") {
    val out = Dedup.nearDups(docs, "doc_id", "text", threshold = 0.5)
    assert(methods(out) === Set("exact"))
    val pairs = out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    // identical docs score exactly 1.0 on the exact tier
    val top = out.filter(col("id_a") === 1L && col("id_b") === 4L)
      .select("score").as[Double].collect()
    assert(top.toSeq === Seq(1.0))
  }

  test("auto: blown df2 budget at threshold < 0.9 routes lsh") {
    withConf("spark.graft.nearDupsExactMaxDf2" -> "0") {
      val out = Dedup.nearDups(docs, "doc_id", "text", threshold = 0.5)
      assert(methods(out) === Set("lsh"))
      val pairs = out.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 4L))) // identical docs always collide
    }
  }

  test("auto: blown df2 budget at threshold >= 0.9 routes simhash") {
    withConf("spark.graft.nearDupsExactMaxDf2" -> "0") {
      val out = Dedup.nearDups(docs, "doc_id", "text", threshold = 0.95)
      assert(methods(out) === Set("simhash"))
      // simhash score = 1 - hamming/64; identical docs → 1.0
      val top = out.filter(col("id_a") === 1L && col("id_b") === 4L)
        .select("score").as[Double].collect()
      assert(top.toSeq === Seq(1.0))
    }
  }

  test("auto: corpus above nearDupsExactMaxDocs skips the stats job") {
    // maxDocs=1 forces the big-corpus branch on 4 docs; exact must
    // NOT run even though its df2 would price in
    withConf("spark.graft.nearDupsExactMaxDocs" -> "1") {
      assert(methods(Dedup.nearDups(docs, "doc_id", "text",
        threshold = 0.5)) === Set("lsh"))
      assert(methods(Dedup.nearDups(docs, "doc_id", "text",
        threshold = 0.9)) === Set("simhash"))
    }
  }

  test("simhash-min-threshold conf moves the lsh/simhash switchover") {
    withConf("spark.graft.nearDupsExactMaxDocs" -> "1",
        "spark.graft.nearDupsSimhashMinThreshold" -> "0.5") {
      assert(methods(Dedup.nearDups(docs, "doc_id", "text",
        threshold = 0.6)) === Set("simhash"))
    }
  }

  test("explicit strategy bypasses selection; unknown one throws") {
    val out = Dedup.nearDups(docs, "doc_id", "text",
      threshold = 0.5, strategy = "simhash")
    assert(methods(out) === Set("simhash"))
    intercept[IllegalArgumentException] {
      Dedup.nearDups(docs, "doc_id", "text", strategy = "fuzzy")
    }
  }
}
