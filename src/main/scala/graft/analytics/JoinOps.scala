package graft.analytics

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.expressions.{BloomMightContain, BloomSet}

/** Semi-join reduction for the big-join failure mode where the dim
  * side is SELECTIVE but too big to broadcast: a plain shuffle join
  * exchanges the entire fact side even though almost none of it will
  * match. [[bloomReduceJoin]] builds a Bloom filter over the dim keys
  * distributed, broadcasts the bits, and pre-filters the fact side
  * before its exchange with a codegen'd membership probe. The result
  * is EXACTLY the rows of the plain join (the Bloom pass can only let
  * extra non-matching rows through to the exact equi-join), so the
  * driver oracle is the plain SQL join itself. The companion skew
  * treatment (hot keys salted over reducers) is
  * [[graft.warehouse.SkewJoin.saltedInnerJoin]].
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

  /** Compiled membership probe over a filter built with
    * [[buildKeyBloom]]. The explicit null guard matters: `xxhash64`
    * of a NULL key is the SEED constant (42), never NULL, so without
    * it a null-key row would pass the probe whenever the filter
    * happens to contain hash 42 — the guard pins the semi-join
    * semantics (a null key joins nothing) instead of leaving them to
    * one filter's bit pattern. */
  def bloomProbe(key: Column, bloom: Broadcast[BloomSet]): Column =
    key.isNotNull && ColumnBridge.column(BloomMightContain(
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
}
