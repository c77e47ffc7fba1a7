package graft

import org.apache.spark.sql.functions._
import graft.analytics.Bpe

/** BPE training and encoding semantics: the Sennrich reference
  * example, merge-order application, overlap handling, and the
  * vocab budget gate. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns corpus-weighted merges with deterministic tie-break") {
    // "low low lower": pair counts over chars —
    // (l,o)=3, (o,w)=3, (w,e)=1, (e,r)=1
    // tie (l,o) vs (o,w) at 3 → (l,o) wins lexicographically;
    // round 2: (lo,w)=3 beats (w,e)/(e,r)
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
  }

  test("encode applies merges in order at symbol granularity") {
    val docs = Seq((1L, "low lower wow")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = docs.select(Bpe.encode(col("text"), merges).as("e"))
      .collect()(0).getString(0)
    // low → [low]; lower → [low, e, r]; wow untouched by (l,o) so
    // (lo,w) cannot fire on it either
    assert(got == "·low· ·low··e··r· ·w··o··w·")
  }

  test("token counts: merged words shrink, repeats merge left-to-right") {
    val docs = Seq(
      (1L, "aaaa"),     // (a,a): 'a a a a' → 'aa aa' (non-overlapping)
      (2L, "aaa"),      // → 'aa a'
      (3L, ""),         // blank → 0
      (4L, "b"))        // single char, no merges apply
      .toDF("doc_id", "text")
    val merges = Seq(("a", "a"))
    val got = docs
      .select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 0L), (4L, 1L)))
  }

  test("wordTokenCount sums to the whole-text tokenCount") {
    import spark.implicits._
    val docs = Seq(
      (1L, "lower lower lowest low er"),
      (2L, "newer news new"),
      (3L, "x")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 6)
    assert(merges.nonEmpty)
    val whole = docs.select(col("doc_id"),
        Bpe.tokenCount(col("text"), merges).as("t"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val perWord = docs
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), Bpe.wordTokenCount(col("w"), merges).as("t"))
      .groupBy("doc_id").agg(sum("t").as("t"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(perWord === whole)
  }

  test("train respects the driver vocab budget") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    spark.conf.set("spark.graft.bpeVocabLimit", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Bpe.train(docs, "text", 1)
      }
      assert(e.getMessage.contains("bpeVocabLimit"))
    } finally spark.conf.unset("spark.graft.bpeVocabLimit")
  }
}
