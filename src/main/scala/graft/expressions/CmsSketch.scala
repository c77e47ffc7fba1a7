package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a native
  * aggregate: `d` rows × `w` counters of exact integer sums —
  * CONSTANT d·w·8 bytes of state per group, map-side partials, and
  * element-wise ADDITION as the merge, so per-partition / per-day
  * sketches roll up losslessly. Point frequency estimates (min over
  * the d probed counters) NEVER undercount and overcount by ≤ ε·N
  * with probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Division of labor with [[graft.analytics.HeavyHitters]]: Space-
  * Saving answers "what are the top-k keys" with a per-key guarantee
  * proof; CMS answers "how often does THIS key occur" for ANY key
  * after one pass — the frequency-table sketch for join-size
  * estimation, rare-key lookup, and skew detection at corpus scale.
  *
  * Input is the engine's portable 30-bit hash ([[graft.analytics
  * .Dedup.h30]]); row `i` buckets it with the engine's universal-hash
  * coefficients (`hashCoeffs(i)`: `((a_i·h + b_i) mod P) mod w` —
  * a·h < 2^60, no overflow). Everything is exact integer arithmetic:
  * same input multiset → same counters, independent of partitioning
  * or merge order, so a DuckDB oracle replays the sketch exactly.
  * Estimation from the returned `array<long>` is plain Column
  * arithmetic — see [[graft.analytics.Sketches.cmsEstimate]].
  */
case class CmsSketch(child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 16, "cms_sketch needs 1 <= d <= 16")
  require(w >= 2, "cms_sketch needs w >= 2")

  private val coeffs: Array[(Long, Long)] =
    Array.tabulate(d)(graft.analytics.Dedup.hashCoeffs)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a pre-hashed LONG input (use Dedup.h30), " +
        s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        val (a, b) = coeffs(i)
        val bucket = (((a * h + b) % graft.analytics.Dedup.P) % w).toInt
        buf(i * w + bucket) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}
