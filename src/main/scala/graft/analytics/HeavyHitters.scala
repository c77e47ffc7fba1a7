package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate heavy hitters for vocabulary censuses whose exact
  * groupBy would shuffle billions of distinct keys (web-scale token
  * vocabularies: every typo, URL fragment and numeral is its own key —
  * the exact census's shuffle is bounded by |vocab|·partitions, which
  * at 100 TB is the bottleneck, not the scan).
  *
  * Two-pass sketch-then-verify (the production census shape):
  *
  *  1. **Sketch**: per-partition Space-Saving (Metwally et al.,
  *     "Efficient computation of frequent and top-k elements in data
  *     streams", ICDT'05) with `capacity` counters. Guarantee: any
  *     token whose in-partition count exceeds N_partition/capacity is
  *     present in that partition's summary, with estimate ≥ true count
  *     and error ≤ recorded `err`. The per-partition summaries (≤
  *     capacity rows each) are unioned — a shuffle bounded by
  *     capacity·partitions, independent of |vocab|.
  *  2. **Verify**: exact recount of ONLY the candidate tokens (a
  *     broadcast semi-join gate on the token stream, then a map-side-
  *     combining count). Whenever every true top-k token clears the
  *     sketch guarantee — overwhelmingly true for Zipf-shaped token
  *     frequencies and sane capacities — the verified result EQUALS the
  *     exact census top-k, deterministically, which is what makes it
  *     oracle-checkable against the exact SQL.
  *
  * The candidate SET itself is order-sensitive at the margin (which
  * low-count tokens survive eviction depends on arrival order), but
  * the verified top-k is not, provided the guarantee covers rank k —
  * the spec asserts this under different partitionings.
  */
object HeavyHitters {

  /** Space-Saving summary of one partition's token stream: at most
    * `capacity` rows of (token, estimate, err) with estimate ≥ true ≥
    * estimate − err. Eviction replaces the current minimum counter
    * (linear scan — fine for the few-thousand capacities a census
    * needs; a production StreamSummary doubly-linked bucket structure
    * makes it O(1) without changing this contract). */
  private[analytics] def spaceSavingPartition(capacity: Int)(
      it: Iterator[String]): Iterator[(String, Long, Long)] = {
    val counts = new java.util.HashMap[String, Array[Long]]()
    while (it.hasNext) {
      val tok = it.next()
      val e = counts.get(tok)
      if (e != null) e(0) += 1
      else if (counts.size < capacity) counts.put(tok, Array(1L, 0L))
      else {
        var minKey: String = null
        var minVal = Long.MaxValue
        val iter = counts.entrySet().iterator()
        while (iter.hasNext) {
          val en = iter.next()
          if (en.getValue()(0) < minVal) {
            minVal = en.getValue()(0); minKey = en.getKey
          }
        }
        counts.remove(minKey)
        counts.put(tok, Array(minVal + 1, minVal))
      }
    }
    import scala.jdk.CollectionConverters._
    counts.asScala.iterator.map { case (k, v) => (k, v(0), v(1)) }
      .toSeq.iterator
  }

  /** Whitespace token stream of a documents frame — the same
    * tokenization as the exact census (q82). */
  private def tokens(docs: DataFrame): Dataset[String] = {
    import docs.sparkSession.implicits._
    docs.where(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .as[String]
  }

  /** Merged sketch candidates: (token, est_upper, err_upper) — the
    * sums of the SURVIVING per-partition estimates/errors. est_upper
    * upper-bounds the token's count over the partitions whose summary
    * it survived into, NOT its global count (partitions that evicted
    * it contribute nothing) — which is why [[approxVocabTopK]] never
    * ranks by it and recounts candidates exactly instead. Row count ≤
    * capacity · partitions — model-sized, broadcastable. */
  def sketchCandidates(docs: DataFrame, capacity: Int): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    tokens(docs).mapPartitions(spaceSavingPartition(capacity))
      .toDF("token", "est", "err")
      .groupBy("token")
      .agg(sum("est").as("est_upper"), sum("err").as("err_upper"))
  }

  /** Verified approximate top-k: sketch → broadcast candidate gate →
    * exact recount of candidates only → top-k (count desc, token asc).
    * Equals the exact census top-k whenever the sketch guarantee
    * covers rank k. Shuffle volume: capacity·partitions (sketch) +
    * candidate tokens only (recount) — never |vocab|·partitions. */
  def approxVocabTopK(docs: DataFrame, k: Int,
      capacity: Int = 4096): DataFrame = {
    val cand = sketchCandidates(docs, capacity).select("token")
    tokens(docs).toDF("token")
      .join(broadcast(cand), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }
}
