package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Sign-LSH bucket id of a vector's RESIDUAL against a reference
  * vector (its cluster centroid): bit b is set iff
  * `fold_b(vec) − fold_b(ref) ≥ 0`, where `fold_b` is the same
  * left-assoc ±1 hyperplane projection as [[SignBuckets]]. Centering
  * on the centroid is what makes within-cluster LSH split: raw
  * projections of same-cell vectors concentrate around the
  * centroid's own projection, so most raw bits are CONSTANT inside a
  * cell and the buckets never shrink; residual projections spread
  * around 0 and split ~uniformly.
  *
  * The per-bit value is defined as the DIFFERENCE OF THE TWO FOLDS
  * (each left-assoc, then one subtract) — mathematically
  * `fold(vec − ref)` but pinned to this evaluation order so the
  * DuckDB oracle (two `list_reduce` folds and a `-`) is
  * bit-identical. NaN differences count as ≥ 0 (both SQL engines
  * order NaN above all doubles). Null parity with [[SignBuckets]]:
  * a null array or null element on EITHER side buckets to 0, a
  * dim-mismatch fails loudly (a silent all-zeros bucket would
  * degrade the LSH equi-join to all-pairs at scale).
  */
case class ResidualSignBuckets(left: Expression, right: Expression,
    signs: Seq[Seq[Double]]) extends BinaryExpression {

  private val bits = signs.length
  private val dim = if (signs.isEmpty) 0 else signs.head.length
  require(bits >= 1 && bits <= 31 && dim >= 1,
    s"residual_sign_buckets: needs 1..31 hyperplanes over >=1 dims, " +
      s"got bits=$bits dim=$dim")
  require(signs.forall(_.length == dim),
    "residual_sign_buckets: ragged hyperplane matrix")
  @transient private lazy val flat: Array[Double] = signs.flatten.toArray

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "residual_sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"residual_sign_buckets needs two ARRAY<DOUBLE>, got " +
          s"${l.sql}, ${r.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val c = right.eval(input)
    if (v == null || c == null) 0
    else ResidualSignBuckets.compute(v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], flat, bits, dim)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", flat, "double[]")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = l.code + r.code + code"""
      int ${ev.value} = 0;
      if (!${l.isNull} && !${r.isNull}) {
        ${ev.value} = graft.expressions.ResidualSignBuckets.compute(
          ${l.value}, ${r.value}, $signsRef, $bits, $dim);
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ResidualSignBuckets =
    copy(left = newLeft, right = newRight)
}

object ResidualSignBuckets {
  /** 0 when either vector carries a null element; an error when
    * either is shorter than `dim`; otherwise the OR of `1 << b` over
    * hyperplanes with `fold(vec) − fold(ref) ≥ 0` (NaN counts as
    * ≥ 0, the SQL ordering). */
  def compute(vec: ArrayData, ref: ArrayData, signs: Array[Double],
      bits: Int, dim: Int): Int = {
    require(vec.numElements() >= dim && ref.numElements() >= dim,
      s"residual_sign_buckets: vectors have ${vec.numElements()}/" +
        s"${ref.numElements()} dims, hyperplanes need $dim — a dim " +
        "mismatch would silently collapse every row into bucket 0 " +
        "and degrade the LSH join to all-pairs")
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j) || ref.isNullAt(j)) return 0
      j += 1
    }
    var bucket = 0
    var b = 0
    while (b < bits) {
      val off = b * dim
      var dv = vec.getDouble(0) * signs(off)
      var dc = ref.getDouble(0) * signs(off)
      var i = 1
      while (i < dim) {
        dv += vec.getDouble(i) * signs(off + i)
        dc += ref.getDouble(i) * signs(off + i)
        i += 1
      }
      val d = dv - dc
      if (d >= 0 || java.lang.Double.isNaN(d)) bucket |= 1 << b
      b += 1
    }
    bucket
  }
}
