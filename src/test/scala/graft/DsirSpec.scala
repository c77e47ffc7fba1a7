package graft

import org.apache.spark.sql.functions._
import graft.analytics.Dsir

/** DSIR importance weights: direction of the score, determinism under
  * partitioning, token accounting, null handling. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha alpha alpha quality prose", true),
    (2L, "alpha quality text alpha alpha", true),
    (3L, "beta beta beta spam spam", false),
    (4L, "beta spam beta spam beta", false),
    (5L, "alpha alpha quality prose text", false), // target-like raw doc
    (6L, "beta spam beta beta spam", false)
  ).toDF("id", "text", "is_t")

  test("target-like documents score above raw-like documents") {
    val w = Dsir.importanceWeights(corpus, "id", "text", $"is_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 5 shares the target's vocabulary, doc 6 the raw-only one
    assert(w(5L) > w(6L), s"expected target-like > raw-like: $w")
    // target docs themselves score above the spam docs
    assert(w(1L) > w(3L) && w(2L) > w(4L))
  }

  test("partitioning-insensitive: identical weights at 1 vs 7 partitions") {
    val a = Dsir.importanceWeights(corpus.coalesce(1), "id", "text",
      $"is_t").orderBy("id").collect().map(_.getDouble(3)).toSeq
    val b = Dsir.importanceWeights(corpus.repartition(7), "id", "text",
      $"is_t").orderBy("id").collect().map(_.getDouble(3)).toSeq
    assert(a == b)
  }

  test("n_tokens counts every token occurrence; null text is dropped") {
    val df = Seq((1L, "a b a", Some(true)), (2L, null, Some(false)))
      .toDF("id", "text", "is_t")
    val got = Dsir.importanceWeights(df, "id", "text", $"is_t")
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(2) == 3L)
  }

  test("uniform corpus: every doc's weight is ~0") {
    // if target and raw distributions coincide, ln-ratio ~ 0 for
    // every bucket (smoothing denominators differ, so not exactly 0)
    val df = Seq((1L, "x y z", true), (2L, "x y z", false))
      .toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", $"is_t")
      .collect().map(_.getDouble(3))
    w.foreach(v => assert(math.abs(v) < 3.0, s"weight $v not near 0"))
  }
}
