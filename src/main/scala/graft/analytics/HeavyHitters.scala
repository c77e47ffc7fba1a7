package graft.analytics

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *     combining count), then a RUNTIME COVERAGE CHECK. Each partition
  *     summary carries the classic Space-Saving absence bound: any
  *     token NOT in the summary has in-partition count ≤ the summary's
  *     minimum estimate (0 if the partition never evicted). Summed over
  *     partitions this bounds the global count of any non-candidate
  *     token, so `k-th verified count > Σ bounds` PROVES the verified
  *     top-k equals the exact census top-k — including tie-breaks,
  *     since candidate counts are exact and no absent token can reach
  *     the k-th count. When the proof fails (adversarially flat
  *     vocabulary, undersized capacity), [[approxVocabTopK]] fails
  *     loudly instead of silently returning a plausible-but-unproven
  *     top-k; [[approxVocabTopKAdaptive]] retries with doubled
  *     capacity until the proof holds.
  *
  * The candidate SET itself is order-sensitive at the margin (which
  * low-count tokens survive eviction depends on arrival order), but
  * the verified top-k is not, whenever the coverage check passes —
  * the property that makes q96 oracle-checkable against the exact
  * census SQL.
  */
object HeavyHitters {

  /** Space-Saving summary of one partition's token stream: at most
    * `capacity` rows of (token, estimate, err, partition id, absence
    * bound) with estimate ≥ true ≥ estimate − err. Eviction replaces
    * the current minimum counter (linear scan — fine for the
    * few-thousand capacities a census needs; a production
    * StreamSummary doubly-linked bucket structure makes it O(1)
    * without changing this contract).
    *
    * `bound` is identical on every row of a partition: the partition's
    * final minimum estimate if any eviction occurred, else 0. Any
    * token ABSENT from this summary has true in-partition count ≤
    * `bound` (each of its occurrences either incremented its own
    * counter — later evicted with estimate ≥ count, and the minimum
    * estimate never decreases — or it never held a counter at all). */
  private[analytics] def spaceSavingPartition(capacity: Int)(
      it: Iterator[String]): Iterator[(String, Long, Long, Int, Long)] = {
    val counts = new java.util.HashMap[String, Array[Long]]()
    var evicted = false
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
        evicted = true
      }
    }
    val pid = TaskContext.getPartitionId()
    var bound = 0L
    if (evicted) {
      bound = Long.MaxValue
      counts.values.forEach(v => if (v(0) < bound) bound = v(0))
    }
    import scala.jdk.CollectionConverters._
    counts.asScala.iterator
      .map { case (k, v) => (k, v(0), v(1), pid, bound) }
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

  /** Raw unioned per-partition summaries: (token, est, err, pid,
    * bound). ≤ capacity · partitions rows — model-sized. Takes the
    * already-tokenized stream so the census can reuse one cached
    * tokenization across the sketch pass, the recount pass, and every
    * adaptive retry — the token explode is the single most expensive
    * map stage of the census, and uncached it ran 2× per attempt. */
  private def sketchSummary(toks: Dataset[String],
      capacity: Int): DataFrame = {
    val sess = toks.sparkSession
    import sess.implicits._
    toks.mapPartitions(spaceSavingPartition(capacity))
      .toDF("token", "est", "err", "pid", "bound")
  }

  /** Merged sketch candidates: (token, est_upper, err_upper) — the
    * sums of the SURVIVING per-partition estimates/errors. est_upper
    * upper-bounds the token's count over the partitions whose summary
    * it survived into, NOT its global count (partitions that evicted
    * it contribute nothing) — which is why [[approxVocabTopK]] never
    * ranks by it and recounts candidates exactly instead. Row count ≤
    * capacity · partitions — model-sized, broadcastable. */
  def sketchCandidates(docs: DataFrame, capacity: Int): DataFrame =
    sketchSummary(tokens(docs), capacity)
      .groupBy("token")
      .agg(sum("est").as("est_upper"), sum("err").as("err_upper"))

  /** Shared sketch → gate → recount → check body. Left = human-readable
    * diagnosis of WHY the sketch cannot certify rank k at this
    * capacity; Right = the proven top-k as a driver-local k-row frame
    * (so the caller's action does not recompute the two corpus scans —
    * a top-k is driver-sized by definition). */
  private def verifiedTopK(toks: Dataset[String], k: Int,
      capacity: Int): Either[String, DataFrame] = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k,
      s"capacity $capacity < k $k: the sketch cannot even hold k counters")
    val sess = toks.sparkSession
    val sk = sketchSummary(toks, capacity)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Σ over partitions of the absence bound — the maximum possible
      // global count of any token that survived into NO summary.
      // bound is constant within a pid, so max() just reads it.
      val absentMax = sk.groupBy("pid").agg(max("bound").as("b"))
        .agg(coalesce(sum("b"), lit(0L)).as("s"))
        .collect()(0).getLong(0)
      val cand = sk.select("token").distinct()
      val verified = toks.toDF("token")
        .join(broadcast(cand), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(k)
      val rows = verified.collect()
      val kth = if (rows.isEmpty) 0L else rows.last.getLong(1)
      val covered =
        absentMax == 0L || (rows.length == k && kth > absentMax)
      if (covered) {
        import scala.jdk.CollectionConverters._
        Right(sess.createDataFrame(rows.toSeq.asJava, verified.schema))
      } else Left(
        s"Space-Saving sketch (capacity=$capacity) cannot certify " +
          s"rank $k: k-th verified count $kth (candidates: " +
          s"${rows.length}) does not exceed the maximum possible " +
          s"count $absentMax of an evicted token")
    } finally { sk.unpersist(false); () }
  }

  /** Verified approximate top-k: sketch → broadcast candidate gate →
    * exact recount of candidates only → top-k (count desc, token asc)
    * → guarantee-coverage check. Shuffle volume: capacity·partitions
    * (sketch) + candidate tokens only (recount) — never
    * |vocab|·partitions.
    *
    * PROVEN equal to the exact census top-k: throws
    * `IllegalStateException` when the sketch cannot certify rank k
    * (k-th verified count ≤ the summed per-partition absence bounds —
    * e.g. an adversarially flat vocabulary at this capacity), rather
    * than silently returning an unproven result. Raise `capacity` or
    * use [[approxVocabTopKAdaptive]]. */
  def approxVocabTopK(docs: DataFrame, k: Int,
      capacity: Int = 4096): DataFrame = {
    val toks = tokens(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try verifiedTopK(toks, k, capacity) match {
      case Right(df) => df
      case Left(diag) => throw new IllegalStateException(
        s"$diag — raise capacity or use approxVocabTopKAdaptive")
    } finally { toks.unpersist(false); () }
  }

  /** Guarantee-aware capacity auto-tuning: run the sketch-then-verify
    * census at `initialCapacity`, doubling until the coverage check
    * certifies rank k or `maxCapacity` is exceeded (then throws with
    * the last diagnosis). Each attempt costs two passes over ONE
    * cached tokenization of the corpus (the explode is the census's
    * dominant map stage; re-tokenizing per pass doubled q96); the
    * doubling ladder is log-short and the common case (Zipf-shaped
    * vocabulary) certifies on the first try. */
  def approxVocabTopKAdaptive(docs: DataFrame, k: Int,
      initialCapacity: Int = 1024,
      maxCapacity: Int = 1 << 20): DataFrame = {
    var cap = math.max(initialCapacity, k)
    var lastDiag = s"initial capacity $cap already exceeds " +
      s"maxCapacity $maxCapacity — no attempt was run"
    val toks = tokens(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      while (cap <= maxCapacity) {
        verifiedTopK(toks, k, cap) match {
          case Right(df) => return df
          case Left(diag) =>
            lastDiag = diag
            // saturating doubling: when the next capacity cannot grow
            // (Int.MaxValue reached) stop instead of re-running the
            // same failing two-pass attempt forever
            val next = math.min(cap.toLong * 2, Int.MaxValue.toLong).toInt
            if (next == cap) throw new IllegalStateException(
              s"capacity saturated at $cap without certifying rank " +
                s"$k: $lastDiag")
            cap = next
        }
      }
    } finally { toks.unpersist(false); () }
    throw new IllegalStateException(
      s"no capacity ≤ $maxCapacity certifies rank $k: $lastDiag")
  }
}
