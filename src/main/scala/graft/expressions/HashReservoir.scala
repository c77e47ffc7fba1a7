package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Deterministic hash-reservoir sample as a native aggregate: the
  * buffer is the set of the `k` smallest (hash, value) pairs seen,
  * ordered by (hash, value). With a uniform row-key hash (the
  * engine's portable `h30` over a unique key) the k hash-minima are a
  * uniform random sample of the group's rows — but a DETERMINISTIC
  * one: same input set → same k pairs, independent of partitioning
  * and merge order, so quantile estimates computed from the sample
  * are reproducible and oracle-checkable (DuckDB re-derives the same
  * k pairs from the same md5 arithmetic).
  *
  * This is the bounded-state quantile path for corpus scale: exact
  * `percentile` shuffles every value per group; the reservoir's
  * partial aggregation is map-side with O(k) state per group, the
  * merge a bounded set union — the same shape as [[KmvSketch]], with
  * the sampled VALUES retained so order statistics survive. Sampling
  * error on a q-quantile is O(1/√k).
  *
  * Set semantics: identical (hash, value) pairs collapse — callers
  * hash a UNIQUE row key, so a collapse needs a 30-bit hash collision
  * AND an equal value; the oracle applies the same DISTINCT.
  *
  * Returns the sampled values as `array<double>` in (hash, value)
  * order (empty array for an empty group).
  */
case class HashReservoir(hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      java.util.TreeSet[HashReservoir.Entry]] {

  require(k >= 1, "hash_reservoir needs k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "hash_reservoir expects a pre-hashed LONG key (use Dedup.h30)," +
          s" got ${hash.dataType.catalogString}")
    else if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        "hash_reservoir expects a DOUBLE value, got " +
          value.dataType.catalogString)
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[HashReservoir.Entry] =
    new java.util.TreeSet[HashReservoir.Entry]()

  private def trim(buf: java.util.TreeSet[HashReservoir.Entry]): Unit =
    while (buf.size > k) { buf.remove(buf.last); () }

  override def update(buf: java.util.TreeSet[HashReservoir.Entry],
      input: InternalRow): java.util.TreeSet[HashReservoir.Entry] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      val e = HashReservoir.Entry(h.asInstanceOf[Long],
        v.asInstanceOf[Double])
      if (buf.size < k || e.compareTo(buf.last) < 0) {
        buf.add(e)
        trim(buf)
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[HashReservoir.Entry],
      b2: java.util.TreeSet[HashReservoir.Entry]): java.util.TreeSet[HashReservoir.Entry] = {
    b1.addAll(b2)
    trim(b1)
    b1
  }

  override def eval(buf: java.util.TreeSet[HashReservoir.Entry]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.forEach { e => out(i) = e.v; i += 1 }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: java.util.TreeSet[HashReservoir.Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { e => bb.putLong(e.h); bb.putDouble(e.v); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[HashReservoir.Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[HashReservoir.Entry]()
    var i = 0
    while (i < n) {
      buf.add(HashReservoir.Entry(bb.getLong, bb.getDouble))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash, value)
  override def prettyName: String = "hash_reservoir"

  override def withNewMutableAggBufferOffset(offset: Int): HashReservoir =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HashReservoir =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashReservoir =
    copy(hash = newChildren(0), value = newChildren(1))
}

object HashReservoir {
  /** (hash, value) pair ordered lexicographically — the value
    * tie-break keeps the reservoir deterministic even across 30-bit
    * hash collisions. */
  final case class Entry(h: Long, v: Double)
      extends Comparable[Entry] {
    override def compareTo(o: Entry): Int = {
      val c = java.lang.Long.compare(h, o.h)
      if (c != 0) c else java.lang.Double.compare(v, o.v)
    }
  }
}
