package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native aggregate:
  * the buffer is the set of the `k` smallest distinct hash values seen,
  * so partial aggregation is map-side with O(k) state per group and
  * the merge is a bounded set union — the sketch shape that replaces a
  * full `COUNT(DISTINCT)` shuffle at corpus scale.
  *
  * Input is an already-hashed LONG uniform on [0, P) (the engine's
  * portable `h30`). Estimate: exact buffer size when fewer than k
  * distinct hashes were seen, else `(k−1)·P / h₍ₖ₎`. Entirely
  * deterministic — same input set → same k minima → same estimate,
  * independent of partitioning or merge order — which also makes it
  * oracle-checkable (DuckDB reproduces the k smallest md5-derived
  * hashes and the same arithmetic).
  */
case class KmvSketch(child: Expression, k: Int, hashSpace: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "KMV needs k >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a pre-hashed LONG input (use Dedup.h30), " +
        s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size > k) buf.remove(buf.last)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k || h < buf.last) {
        buf.add(h)
        trim(buf)
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    trim(b1)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n < k) n.toDouble
    else (k - 1).toDouble * hashSpace / buf.last.toDouble
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}
