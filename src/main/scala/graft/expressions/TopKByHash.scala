package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded per-group top-k as a native aggregate: keep the `k` rows
  * with the SMALLEST (hash, id) order key, payload columns riding
  * along as an `array<struct<…>>` result in that order.
  *
  * This is the map-side-combine form of the `row_number() OVER
  * (PARTITION BY g ORDER BY h, id) <= k` window: the window shuffles
  * EVERY row of the corpus to its group's reducer before ranking,
  * while this aggregate's partial phase caps state at k rows per
  * group per input partition, so the exchange ships at most
  * k·partitions rows per group — at 100 TB the difference between
  * shuffling the corpus and shuffling a sample. Determinism matches
  * the window form exactly: the order key is (portable hash, unique
  * id), so 30-bit hash collisions tie-break identically in both
  * formulations and in the DuckDB oracle's ORDER BY.
  *
  * `children` = hash :: id :: payload columns; payloads are stored as
  * copied `UnsafeRow`s (schema = `fieldNames` zip payload types), so
  * any column types ride along without per-type code.
  */
case class TopKByHash(children: Seq[Expression], fieldNames: Seq[String],
    k: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[TopKByHash.Entry]] {

  require(k >= 1, "top_k_by_hash needs k >= 1")
  require(children.length >= 3,
    "top_k_by_hash needs (hash, id, payload...) children")
  require(fieldNames.length == children.length - 2,
    "top_k_by_hash: one field name per payload column")

  private def hashExpr: Expression = children(0)
  private def idExpr: Expression = children(1)
  private def payloadExprs: Seq[Expression] = children.drop(2)

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(payloadExprs)

  private def payloadSchema: StructType =
    StructType(fieldNames.zip(payloadExprs).map { case (n, e) =>
      StructField(n, e.dataType, e.nullable) })

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "top_k_by_hash expects LONG (hash, id) order keys, got " +
          s"(${hashExpr.dataType.catalogString}, " +
          s"${idExpr.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[TopKByHash.Entry] =
    new java.util.TreeSet[TopKByHash.Entry]()

  private def trim(buf: java.util.TreeSet[TopKByHash.Entry]): Unit =
    while (buf.size > k) { buf.remove(buf.last); () }

  override def update(buf: java.util.TreeSet[TopKByHash.Entry],
      input: InternalRow): java.util.TreeSet[TopKByHash.Entry] = {
    val h = hashExpr.eval(input)
    val id = idExpr.eval(input)
    if (h != null && id != null) {
      val hl = h.asInstanceOf[Long]
      val il = id.asInstanceOf[Long]
      // only materialize the payload if the row can enter the top-k
      if (buf.size < k || {
            val last = buf.last
            hl < last.h || (hl == last.h && il < last.id)
          }) {
        buf.add(TopKByHash.Entry(hl, il, proj(input).copy()))
        trim(buf)
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[TopKByHash.Entry],
      b2: java.util.TreeSet[TopKByHash.Entry]): java.util.TreeSet[TopKByHash.Entry] = {
    b1.addAll(b2)
    trim(b1)
    b1
  }

  override def eval(buf: java.util.TreeSet[TopKByHash.Entry]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.forEach { e => out(i) = e.row; i += 1 }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: java.util.TreeSet[TopKByHash.Entry]): Array[Byte] = {
    var bytes = 4
    buf.forEach { e => bytes += 20 + e.row.getSizeInBytes }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.forEach { e =>
      bb.putLong(e.h); bb.putLong(e.id)
      bb.putInt(e.row.getSizeInBytes)
      e.row.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[TopKByHash.Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[TopKByHash.Entry]()
    val width = payloadExprs.length
    var i = 0
    while (i < n) {
      val h = bb.getLong
      val id = bb.getLong
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(width)
      row.pointTo(rowBytes, len)
      buf.add(TopKByHash.Entry(h, id, row))
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(payloadSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_hash"

  override def withNewMutableAggBufferOffset(offset: Int): TopKByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByHash =
    copy(children = newChildren)
}

object TopKByHash {
  /** (hash, id)-ordered entry; id is a unique row key, so distinct
    * rows never compare equal and TreeSet set-semantics cannot drop a
    * legitimate row on a 30-bit hash collision. */
  final case class Entry(h: Long, id: Long, row: UnsafeRow)
      extends Comparable[Entry] {
    override def compareTo(o: Entry): Int = {
      val c = java.lang.Long.compare(h, o.h)
      if (c != 0) c else java.lang.Long.compare(id, o.id)
    }
  }
}
