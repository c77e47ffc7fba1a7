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

  /** One tracked token: its estimate/err plus its position in the
    * bucket structure (intrusive doubly-linked within-bucket list). */
  private final class Counter(var key: String, var err: Long) {
    var bucket: Bucket = _
    var prev: Counter = _
    var next: Counter = _
  }

  /** All counters sharing one estimate value, as a node of the
    * count-ordered doubly-linked bucket list (Metwally et al.'s
    * StreamSummary): the head bucket holds the minimum estimate, so
    * finding a victim is O(1), and an increment moves a counter to
    * the adjacent bucket — also O(1). */
  private final class Bucket(val count: Long) {
    var prevB: Bucket = _
    var nextB: Bucket = _
    var head: Counter = _
  }

  /** The StreamSummary structure behind [[spaceSavingPartition]]:
    * counter lookup by token (hash map) + count-ordered buckets for
    * O(1) min-eviction and O(1) increment. The previous
    * implementation evicted by an O(capacity) linear scan — fine at
    * the few-thousand default, but [[approxVocabTopKAdaptive]] climbs
    * to 2²⁰ counters on adversarially flat vocabularies, where a
    * per-token linear scan is the difference between a census and a
    * hang. Same observable contract: estimate ≥ true ≥ estimate − err,
    * eviction replaces A minimum counter (which minimum is
    * tie-arbitrary, exactly as the scan's iteration order was). */
  private final class StreamSummary(capacity: Int) {
    private val index = new java.util.HashMap[String, Counter]()
    private var minBucket: Bucket = _
    var evicted = false

    private def unlink(c: Counter): Unit = {
      val b = c.bucket
      if (c.prev != null) c.prev.next = c.next else b.head = c.next
      if (c.next != null) c.next.prev = c.prev
      c.prev = null; c.next = null; c.bucket = null
      if (b.head == null) { // bucket emptied — drop it from the list
        if (b.prevB != null) b.prevB.nextB = b.nextB
        else minBucket = b.nextB
        if (b.nextB != null) b.nextB.prevB = b.prevB
      }
    }

    private def pushInto(c: Counter, b: Bucket): Unit = {
      c.bucket = b
      c.next = b.head
      if (b.head != null) b.head.prev = c
      b.head = c
    }

    /** Move `c` (currently count `from`, already unlinked) into the
      * bucket for `from + 1`, creating it in place if absent.
      * `after` is the bucket `c` came from when it still exists, else
      * the bucket preceding the insertion point (null → new head). */
    private def promote(c: Counter, after: Bucket, to: Long): Unit = {
      val candidate = if (after == null) minBucket else after.nextB
      val target =
        if (candidate != null && candidate.count == to) candidate
        else {
          val nb = new Bucket(to)
          nb.prevB = after
          nb.nextB = candidate
          if (after != null) after.nextB = nb else minBucket = nb
          if (candidate != null) candidate.prevB = nb
          nb
        }
      pushInto(c, target)
    }

    def offer(tok: String): Unit = {
      val existing = index.get(tok)
      if (existing != null) {
        val b = existing.bucket
        val to = b.count + 1
        unlink(existing)
        // b may have been dropped by unlink; its prevB/nextB remain
        // valid as an insertion anchor only if it survived — recompute
        // from whichever of b/b.prevB is still linked
        val anchor = if (b.head != null) b else b.prevB
        promote(existing, anchor, to)
      } else if (index.size < capacity) {
        val c = new Counter(tok, 0L)
        index.put(tok, c)
        if (minBucket != null && minBucket.count == 1L) pushInto(c, minBucket)
        else {
          val nb = new Bucket(1L)
          nb.nextB = minBucket
          if (minBucket != null) minBucket.prevB = nb
          minBucket = nb
          pushInto(c, nb)
        }
      } else {
        // evict A minimum counter: any member of the head bucket
        evicted = true
        val victim = minBucket.head
        val minCount = minBucket.count
        index.remove(victim.key)
        unlink(victim)
        victim.key = tok
        victim.err = minCount
        index.put(tok, victim)
        // victim's old bucket may or may not survive; anchor on the
        // surviving bucket BELOW the target count, if any
        val anchor =
          if (minBucket != null && minBucket.count <= minCount) minBucket
          else null
        promote(victim, anchor, minCount + 1)
      }
    }

    /** Final (token, est, err) rows plus the absence bound (minimum
      * surviving estimate if any eviction occurred, else 0). */
    def result(): (List[(String, Long, Long)], Long) = {
      var rows = List.empty[(String, Long, Long)]
      var b = minBucket
      while (b != null) {
        var c = b.head
        while (c != null) { rows ::= ((c.key, b.count, c.err)); c = c.next }
        b = b.nextB
      }
      val bound =
        if (evicted && minBucket != null) minBucket.count else 0L
      (rows, bound)
    }
  }

  /** Space-Saving summary of one partition's token stream: at most
    * `capacity` rows of (token, estimate, err, partition id, absence
    * bound) with estimate ≥ true ≥ estimate − err. Eviction and
    * increment are O(1) via the [[StreamSummary]] bucket structure.
    *
    * `bound` is identical on every row of a partition: the partition's
    * final minimum estimate if any eviction occurred, else 0. Any
    * token ABSENT from this summary has true in-partition count ≤
    * `bound` (each of its occurrences either incremented its own
    * counter — later evicted with estimate ≥ count, and the minimum
    * estimate never decreases — or it never held a counter at all). */
  private[analytics] def spaceSavingPartition(capacity: Int)(
      it: Iterator[String]): Iterator[(String, Long, Long, Int, Long)] = {
    val ss = new StreamSummary(capacity)
    while (it.hasNext) ss.offer(it.next())
    val pid = TaskContext.getPartitionId()
    val (rows, bound) = ss.result()
    rows.iterator.map { case (k, est, err) => (k, est, err, pid, bound) }
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
    // driver-side guard: with capacity < 1 the StreamSummary eviction
    // branch would NPE inside an executor task (there is no bucket to
    // evict from) — fail with a message before any job launches
    require(capacity >= 1,
      s"Space-Saving sketch needs capacity >= 1, got $capacity")
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
