package graft

import org.apache.spark.sql.functions._
import graft.analytics.HeavyHitters

/** Space-Saving sketch-then-verify census (`analytics/HeavyHitters`):
  * the guarantee (heavy tokens always survive the sketch), equality
  * with the exact census on the verified top-k, and insensitivity of
  * the verified result to partitioning — the property that makes q96
  * oracle-checkable.
  */
class HeavyHittersSpec extends SparkSpec {

  /** Skewed corpus: 20 heavy tokens ×100 docs, 2000 one-off tail
    * tokens — one token per doc keeps the tokenizer trivial. */
  private lazy val docs = {
    import spark.implicits._
    val heavy = for (i <- 0 until 20; _ <- 0 until 100)
      yield s"heavy$i"
    val tail = (0 until 2000).map(i => s"tail$i")
    (heavy ++ tail).zipWithIndex
      .map { case (t, id) => (id.toLong, t) }
      .toDF("doc_id", "text")
  }

  private lazy val exactTop10 = docs
    .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    .groupBy("token").agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("token")).limit(10)
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("sketch guarantee: every token above N/capacity survives " +
      "into the candidate set") {
    val cand = HeavyHitters.sketchCandidates(docs.repartition(7), 64)
      .select("token").collect().map(_.getString(0)).toSet
    // N = 4000 tokens over 7 partitions, capacity 64 ⇒ per-partition
    // error ≲ 9; heavy tokens appear ~100 times, far above
    for (i <- 0 until 20)
      assert(cand.contains(s"heavy$i"), s"heavy$i missing from sketch")
  }

  test("capacity < 1 fails loudly on the driver, not as an executor NPE") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.sketchCandidates(docs, 0)
    }
    assert(e.getMessage.contains("capacity >= 1"))
  }

  test("verified top-k equals the exact census top-k") {
    val got = HeavyHitters.approxVocabTopK(docs, k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exactTop10)
  }

  test("verified top-k is partitioning-insensitive (the margin of " +
      "the candidate set is not, but the verified result is)") {
    val one = HeavyHitters
      .approxVocabTopK(docs.repartition(1), k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seven = HeavyHitters
      .approxVocabTopK(docs.repartition(7), k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(one === seven)
    assert(one === exactTop10)
  }

  test("sketch size is bounded by capacity x partitions, not vocab") {
    val n = HeavyHitters.sketchCandidates(docs.repartition(4), 32)
      .count()
    assert(n <= 32L * 4, s"sketch emitted $n rows")
  }

  /** Adversarially FLAT corpus: 3000 distinct tokens, every one
    * appearing exactly twice. At small capacities the k-th count (2)
    * cannot exceed the eviction bound, so no top-k is certifiable —
    * the silent-wrong-answer case the runtime coverage check exists
    * to catch. */
  private lazy val flatDocs = {
    import spark.implicits._
    (0 until 3000).flatMap(i => Seq.fill(2)(f"flat$i%04d"))
      .zipWithIndex
      .map { case (t, id) => (id.toLong, t) }
      .toDF("doc_id", "text")
  }

  private lazy val flatExactTop10 = flatDocs
    .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    .groupBy("token").agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("token")).limit(10)
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("flat vocabulary at small capacity fails loudly instead of " +
      "silently returning an unproven top-k") {
    val e = intercept[IllegalStateException] {
      HeavyHitters.approxVocabTopK(flatDocs.repartition(3), k = 10,
        capacity = 64)
    }
    assert(e.getMessage.contains("cannot certify"),
      s"unexpected message: ${e.getMessage}")
  }

  test("adaptive capacity doubling certifies the flat vocabulary and " +
      "matches the exact census") {
    val got = HeavyHitters
      .approxVocabTopKAdaptive(flatDocs.repartition(3), k = 10,
        initialCapacity = 64, maxCapacity = 1 << 14)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === flatExactTop10)
  }

  test("certified skewed top-k survives the coverage check under " +
      "different partitionings (bound stays below the k-th count)") {
    // N=4000 tokens, capacity 64: summed absence bound <= N/64 < 63,
    // k-th heavy count = 100 — certified for any partition count.
    for (p <- Seq(1, 7)) {
      val got = HeavyHitters
        .approxVocabTopK(docs.repartition(p), k = 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === exactTop10, s"partitions=$p")
    }
  }
}
