package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Argmax-by-score with payload as a native aggregate: keeps the
  * (score, id, payload) triple of the best-scoring input row, where
  * better = higher score, ties to the LOWER id, NaN scoring greatest
  * (Spark/DuckDB sort order). Built for nearest-centroid assignment:
  * `max(struct(...))` over a struct has no Tungsten mutable buffer,
  * so Spark falls back to SortAggregate — sorting every (row ×
  * centroid) crossed record, array payload included, before reducing.
  * This TypedImperativeAggregate runs as ObjectHashAggregate: O(1)
  * state per group, map-side partials, no sort of the crossed set,
  * and the payload array is copied only when a row improves the
  * current best (~ln k times per group, not k). The payload keeps
  * its input element type (float or double) so persisted layouts —
  * the IVF cell tables store float — do not silently widen.
  *
  * Null scores are skipped (an all-null group returns a null struct);
  * the crossed cosine is null only for malformed embeddings, which
  * every shipped caller filters or never produces.
  */
case class ArgMaxCell(score: Expression, id: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgMaxCell.Buf] {

  private lazy val payloadIsFloat: Boolean = payload.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_cell score must be DOUBLE, got ${score.dataType.catalogString}")
    else if (id.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_cell id must be INT, got ${id.dataType.catalogString}")
    else payload.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmax_cell payload must be ARRAY<DOUBLE|FLOAT>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): ArgMaxCell.Buf = new ArgMaxCell.Buf

  /** NaN-greatest, ties to lower id — identical to ORDER BY score
    * DESC, id ASC in both engines. */
  private def better(s: Double, i: Int, b: ArgMaxCell.Buf): Boolean = {
    if (b.empty) return true
    val c = java.lang.Double.compare(s, b.score)
    c > 0 || (c == 0 && i < b.id)
  }

  override def update(buf: ArgMaxCell.Buf, input: InternalRow): ArgMaxCell.Buf = {
    val s = score.eval(input)
    if (s != null) {
      val sv = s.asInstanceOf[Double]
      val iv = id.eval(input).asInstanceOf[Int]
      if (better(sv, iv, buf)) {
        val p = payload.eval(input).asInstanceOf[ArrayData]
        buf.score = sv
        buf.id = iv
        buf.payload =
          if (p == null) null
          else if (payloadIsFloat) p.toFloatArray()
          else p.toDoubleArray()
        buf.empty = false
      }
    }
    buf
  }

  override def merge(b1: ArgMaxCell.Buf, b2: ArgMaxCell.Buf): ArgMaxCell.Buf = {
    if (!b2.empty && better(b2.score, b2.id, b1)) {
      b1.score = b2.score; b1.id = b2.id; b1.payload = b2.payload
      b1.empty = false
    }
    b1
  }

  override def eval(buf: ArgMaxCell.Buf): Any =
    if (buf.empty) null
    else new GenericInternalRow(Array[Any](buf.score, buf.id,
      buf.payload match {
        case null => null
        case d: Array[Double] => new GenericArrayData(d)
        case f: Array[Float] => new GenericArrayData(f)
      }))

  override def serialize(buf: ArgMaxCell.Buf): Array[Byte] = {
    if (buf.empty) return Array[Byte](0)
    val width = if (payloadIsFloat) 4 else 8
    val n = buf.payload match {
      case null => -1
      case d: Array[Double] => d.length
      case f: Array[Float] => f.length
    }
    val bb = ByteBuffer.allocate(1 + 8 + 4 + 4 + width * math.max(n, 0))
    bb.put(1.toByte).putDouble(buf.score).putInt(buf.id).putInt(n)
    buf.payload match {
      case null =>
      case d: Array[Double] =>
        var i = 0; while (i < d.length) { bb.putDouble(d(i)); i += 1 }
      case f: Array[Float] =>
        var i = 0; while (i < f.length) { bb.putFloat(f(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxCell.Buf = {
    val buf = new ArgMaxCell.Buf
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 0.toByte) return buf
    buf.score = bb.getDouble
    buf.id = bb.getInt
    val n = bb.getInt
    buf.payload =
      if (n < 0) null
      else if (payloadIsFloat) {
        val a = new Array[Float](n)
        var i = 0; while (i < n) { a(i) = bb.getFloat; i += 1 }
        a
      } else {
        val a = new Array[Double](n)
        var i = 0; while (i < n) { a(i) = bb.getDouble; i += 1 }
        a
      }
    buf.empty = false
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false),
    StructField("payload", payload.dataType, nullable = true)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(score, id, payload)
  override def prettyName: String = "argmax_cell"

  override def withNewMutableAggBufferOffset(offset: Int): ArgMaxCell =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArgMaxCell =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxCell =
    copy(score = newChildren(0), id = newChildren(1),
      payload = newChildren(2))
}

object ArgMaxCell {
  /** Mutable best-so-far: score/id/payload of the winning row; the
    * payload is Array[Double] or Array[Float] per the input type. */
  final class Buf {
    var empty: Boolean = true
    var score: Double = 0.0
    var id: Int = 0
    var payload: AnyRef = null
  }
}
