package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Integer dot product of two array<long> columns as a native
  * expression — the compiled hot path of int8-quantized ANN scoring
  * ([[graft.analytics.Similarity.sq8TopK]]). The HOF formulation
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) is evaluated
  * interpreted with per-element boxing; this expression is one
  * compiled loop over the packed long arrays and stays inside
  * WholeStageCodegen via `doGenCode`'s static call.
  *
  * Semantics are identical to the HOF chain: integer arithmetic is
  * exact and order-insensitive, so results are bit-identical; null
  * parity too — mismatched lengths or a null element yield null
  * (zip_with null-pads the shorter array, and null elements propagate
  * through `*`/`+`), hence the `nullable` override.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"

  // analysis-time input validation (the RequiresStringInput rationale,
  // StringInput.scala): a SQL call like dot_long(doc_id, arr) must
  // fail at analysis, not as an executor ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r =
         |  graft.expressions.DotLong.compute($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLong = copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Shared by eval and generated code (static forwarder). Returns
    * null for length mismatch or null elements — see class doc. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }
}
