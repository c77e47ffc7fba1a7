package graft.analytics

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.expressions.{BloomMightContain, BloomSet}

/** Join-shape operators for the two big-join failure modes a 100 TB
  * cluster actually hits:
  *
  *  - a SELECTIVE dim side that is too big to broadcast: the join
  *    shuffles the entire fact side even though almost none of it will
  *    match → [[bloomReduceJoin]] (semi-join reduction via a broadcast
  *    Bloom filter, probe compiled into the scan stage);
  *  - a SKEWED key: one hash partition receives a hot key's entire
  *    row set and the stage runs at the speed of that one task →
  *    [[saltedJoin]] (salt the big side, replicate the small side per
  *    salt, aggregate after — deterministic results, bounded task
  *    sizes even where AQE's skew split cannot apply, e.g. under a
  *    required child distribution).
  *
  * Both return EXACTLY the rows of the plain join (the Bloom pass can
  * only let extra non-matching rows through to the exact equi-join;
  * salting only re-buckets rows) — so the driver oracle for these is
  * the plain SQL join itself.
  */
object JoinOps {

  /** Distributed Bloom build over `keys.select(key)`: per-partition
    * word arrays OR-merged with `treeAggregate` (depth 2: merge cost
    * on the driver is O(filter size · √partitions → executors first).
    * Nulls are dropped (a null key joins nothing). Size is gated by
    * `spark.graft.bloomMaxBytes` (default 64 MB ≈ 56 M keys at 1%
    * fpp) — past that, fail loudly rather than silently ship a
    * too-large broadcast per executor.
    */
  def buildKeyBloom(keys: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Broadcast[BloomSet] = {
    val spark = keys.sparkSession
    val (numWords, k) = BloomSet.params(expectedItems, fpp)
    val maxBytes = spark.conf
      .get("spark.graft.bloomMaxBytes", (64L * 1024 * 1024).toString).toLong
    require(numWords.toLong * 8L <= maxBytes,
      s"bloom build needs ${numWords.toLong * 8L} bytes for " +
        s"$expectedItems items at fpp=$fpp, over " +
        s"spark.graft.bloomMaxBytes=$maxBytes — raise fpp or the budget")
    val hashes = keys.where(key.isNotNull).select(xxhash64(key).as("h"))
    import org.apache.spark.sql.Encoders
    val words = hashes.as[Long](Encoders.scalaLong).rdd
      .treeAggregate(new Array[Long](numWords))(
        (acc, h) => { BloomSet.insert(acc, k, h); acc },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        },
        depth = 2)
    spark.sparkContext.broadcast(new BloomSet(words, k))
  }

  /** `bloom_might_contain(xxhash64(key))` as a Column — the compiled
    * membership probe over a filter built with [[buildKeyBloom]]. */
  def bloomProbe(key: Column, bloom: Broadcast[BloomSet]): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(xxhash64(key)), bloom))

  /** Semi-join-reduced inner equi-join: build a Bloom over the dim
    * side's join keys, pre-filter the fact side BEFORE its exchange,
    * then run the exact join. False positives are eliminated by the
    * join itself, so the result is row-identical to
    * `fact.join(dim, fact(key) === dim(key))` — only the shuffled
    * volume changes (to match-rate + fpp of the fact side).
    */
  def bloomReduceJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column, expectedDimKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = buildKeyBloom(dim, dimKey, expectedDimKeys, fpp)
    fact.where(bloomProbe(factKey, bloom))
      .join(dim, factKey === dimKey)
  }

  /** Skew-salted inner equi-join of a skewed `big` side against a
    * `small` (but not broadcast-able) side: the big side gets a
    * deterministic per-row salt in [0, salts), the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `salts` partitions
    * instead of one. Row-identical to the plain join: every big row
    * meets every matching small row exactly once (at its own salt).
    * The salt is derived by hashing the whole big row (`xxhash64` over
    * its columns), not `rand()` — deterministic under retries and
    * partition reshuffles, which speculative execution at 1000
    * executors requires.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = pmod(
      xxhash64(big.columns.map(big(_)): _*), lit(salts.toLong))
    val saltedBig = big.withColumn("__salt", saltCol)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedBig
      .join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
