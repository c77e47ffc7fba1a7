package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two array<float|double> columns as a native
  * expression — one compiled pass accumulating dot, ‖a‖², ‖b‖²
  * simultaneously, replacing three interpreted `zip_with`+`aggregate`
  * HOF passes (~77 µs/pair) in the similarity/ANN hot paths.
  * `doGenCode` emits a static call, so the expression stays inside
  * WholeStageCodegen rather than falling back to interpreted eval.
  *
  * Float arrays are read directly (`getFloat(i).toDouble` — the exact
  * same double the old `cast("array<double>")` produced, since
  * float→double widening is exact). The cast this replaces sat ABOVE
  * the pair join in every all-pairs/candidate scorer, so it
  * re-materialized both arrays once per PAIR — O(pairs·dim) pure
  * allocation the one-pass kernel now skips (guide §1.2 "per-task
  * work": q251/q256-class exact scans are pair-bound, not row-bound).
  *
  * Bit-compatible with the HOF formulation (and therefore with every
  * existing oracle): each accumulator is the same left fold
  * `0.0 + x₁·y₁ + x₂·y₂ + …` in identical IEEE order, and the result
  * is `dot / (sqrt(na) · sqrt(nb))`. Null parity too: mismatched
  * lengths or a null element yield null, exactly as `zip_with`'s
  * null-padding and null-propagating arithmetic did — hence the
  * `nullable` override (the inherited child-based nullability would
  * make codegen unbox a null result).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

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
    CosineSim.compute(a.asInstanceOf[ArrayData], leftFloat,
      b.asInstanceOf[ArrayData], rightFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.expressions.CosineSim.compute($a, $leftFloat, $b, $rightFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Shared by eval and generated code (static forwarder). `xFloat` /
    * `yFloat` say whether the array holds floats (read via
    * `getFloat(i).toDouble`, bit-identical to a pre-cast double) —
    * constant per call site, so the JIT hoists the branch. Returns
    * null for length mismatch or null elements — see class doc. */
  def compute(x: ArrayData, xFloat: Boolean, y: ArrayData,
      yFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
