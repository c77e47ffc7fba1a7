package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** HyperLogLog distinct-count sketch as a native aggregate (Flajolet
  * et al. 2007): the buffer is a fixed `m = 2^b` byte register array —
  * CONSTANT state per group regardless of cardinality, map-side
  * partials, and a register-wise-max merge. This is the sketch that
  * replaces `COUNT(DISTINCT)` at 100 TB: where [[KmvSketch]] keeps k
  * hash minima (O(k · 8) bytes, exact below k), HLL keeps one byte
  * per register (m bytes total, σ ≈ 1.04/√m relative error at ANY
  * cardinality) and two sketches merge with a byte-wise max — the
  * shape that lets per-partition / per-day sketches be stored and
  * rolled up without touching raw data again.
  *
  * Input is the engine's portable 60-bit hash ([[graft.analytics
  * .Dedup.h60]], md5-prefix): register index = top `b` bits, and
  * rho = leading-zero count of the remaining `w = 60 − b` bits plus
  * one (an all-zero remainder gives the max rho, w + 1).
  *
  * Determinism contract (what lets a DuckDB oracle hash-match a
  * probabilistic sketch): same input set → same registers, regardless
  * of partitioning or merge order (max is commutative/associative/
  * idempotent). The estimate avoids order-dependent float sums — the
  * harmonic term Σ 2^−M_j is computed as the INTEGER
  * `S = Σ 2^(maxRho − M_j)` (≤ m · 2^maxRho < 2^63, exact), and the
  * raw estimate is `alpha · m² · 2^maxRho / S` with one double
  * division at the end. The small-range (linear-counting) branch
  * `m · ln(m / zeros)` is floor(x·1e9+0.5)-quantized, mirroring the
  * engine's established ln-quantization convention (q117/q121).
  * No large-range correction: it exists to patch 32-bit hash
  * saturation, and the 60-bit hash space (2^60 ≈ 1.2e18) is far
  * beyond any corpus cardinality here.
  */
case class HllSketch(child: Expression, b: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(b >= 4 && b <= 16, "hll_distinct needs 4 <= b <= 16")

  private val m: Int = 1 << b
  /** Remainder width; rho ranges over [1, wBits + 1]. */
  private val wBits: Int = 60 - b
  private val wMask: Long = (1L << wBits) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_distinct expects a pre-hashed LONG input (use Dedup.h60), " +
        s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> wBits).toInt & (m - 1)
      val w = h & wMask
      // rho = position of the highest set bit counted from the top of
      // the wBits-wide remainder; all-zero remainder -> wBits + 1.
      val rho =
        if (w == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val maxRho = wBits + 1
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      s += 1L << (maxRho - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = HllSketch.alpha(m) * m.toDouble * m.toDouble *
      HllSketch.pow2(maxRho) / s.toDouble
    if (raw <= 2.5 * m && zeros > 0)
      math.floor(m.toDouble * math.log(m.toDouble / zeros) * 1e9 + 0.5) / 1e9
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Standard HLL bias-correction constant. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** 2^e as an exactly-representable double (e <= 60). */
  def pow2(e: Int): Double = (1L << e).toDouble
}
