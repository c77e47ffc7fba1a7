package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two array<float|double> columns — the pair-kernel
  * half of [[CosineSim]]: the SAME left fold `0.0 + x₁·y₁ + x₂·y₂ + …`
  * in identical IEEE order, without the two norm accumulators.
  *
  * Exists so pair-bound scorers can precompute each row's norm ONCE
  * (`sqrt(dot(e,e))` — `dot(e,e)` is bit-identical to CosineSim's
  * internal `na += xi·xi` fold) BEFORE the pair join and score with
  *   dot(a,b) / (norm_a · norm_b),
  * which is the exact expression CosineSim evaluates
  * (`dot / (sqrt(na) · sqrt(nb))`; IEEE multiply is commutative, sqrt
  * is correctly rounded) — bit-identical scores at a third of the
  * per-pair flops. An all-pairs scan of p pairs drops from 3·p·dim
  * multiply-adds to p·dim plus 2·n·dim for the precomputed norms.
  *
  * Null parity with [[CosineSim]]: mismatched lengths or a null
  * element yield null — so `dot(a,b)` alone already reproduces
  * CosineSim's null set (a norm built from the same array is null
  * only when the dot is).
  */
case class Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val leftFloat = isFloat(left.dataType)
  @transient private lazy val rightFloat = isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Dot.compute(a.asInstanceOf[ArrayData], leftFloat,
      b.asInstanceOf[ArrayData], rightFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.expressions.Dot.compute($a, $leftFloat, $b, $rightFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Dot = copy(left = newLeft, right = newRight)
}

object Dot {
  /** Shared by eval and generated code (static forwarder) — the
    * [[CosineSim.compute]] loop minus the norm accumulators; see the
    * class doc for the bit-identity argument. */
  def compute(x: ArrayData, xFloat: Boolean, y: ArrayData,
      yFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
}

/** `dot / (normA · normB)` as a native expression — the tail of
  * [[CosineSim.compute]] over a precomputed dot and per-row norms.
  * It must NOT be the SQL `Divide`: under ANSI mode (the Spark 4
  * default) `Divide.eval` raises DIVIDE_BY_ZERO even for doubles,
  * where CosineSim's JVM division yields the IEEE NaN/±Inf the
  * oracles expect (zero vectors score NaN, which sorts greatest —
  * load-bearing in the argmax/threshold tails). Plain Java double
  * arithmetic here is bit-identical to CosineSim's
  * `dot / (sqrt(na) · sqrt(nb))`. Null if any input is null — the
  * same null set as CosineSim given norms derived from the same
  * arrays as the dot. */
case class CosineFromNorms(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_from_norms"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override protected def nullSafeEval(d: Any, na: Any, nb: Any): Any =
    d.asInstanceOf[Double] /
      (na.asInstanceOf[Double] * nb.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, na, nb) => {
      s"${ev.value} = $d / ($na * $nb);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CosineFromNorms =
    copy(first = newFirst, second = newSecond, third = newThird)
}
