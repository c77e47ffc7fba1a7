package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, NullType}

/** Pack an array<long> of int8-range values into a binary column, one
  * signed byte per element — the at-rest form of the quantized ANN
  * codes ([[graft.analytics.Similarity.sq8QuantizePacked]]). An
  * array<long> column nominally stores 8 bytes per dimension (parquet
  * dictionary/bit-packing claws some back, but the in-memory scan and
  * shuffle rows do not); the packed form makes the 4× (vs float32)
  * reduction real everywhere: disk, shuffle, and the scoring loop's
  * cache footprint.
  *
  * A value outside [-128, 127] throws (quantized codes are within
  * ±127 by construction — silently truncating would corrupt scores);
  * a null element yields a null result, matching HOF null propagation.
  */
case class PackI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pack_i8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_i8 expects array<bigint>, got ${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    PackI8.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |byte[] ${ev.value}_r = graft.expressions.PackI8.compute($a);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackI8 =
    copy(child = newChild)
}

object PackI8 {
  /** Shared by eval and generated code. Null on null element; throws
    * on a value outside the signed-byte range. */
  def compute(x: ArrayData): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      if (v < Byte.MinValue || v > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"pack_i8: value $v outside signed-byte range")
      out(i) = v.toByte
      i += 1
    }
    out
  }
}

/** Integer dot product of two packed-int8 binary columns
  * ([[PackI8]]) — one compiled loop over the byte arrays, the hot
  * path of [[graft.analytics.Similarity.sq8TopKPacked]]. Null on
  * length mismatch, like [[DotLong]] on mismatched arrays.
  */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i8"

  // analysis-time input validation (the RequiresStringInput rationale,
  // StringInput.scala): wrong-typed SQL calls must fail at analysis,
  // not as an executor ClassCastException mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case BinaryType | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName requires two BINARY arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotI8.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r =
         |  graft.expressions.DotI8.compute($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotI8 = copy(left = newLeft, right = newRight)
}

object DotI8 {
  /** Shared by eval and generated code; null on length mismatch. */
  def compute(x: Array[Byte], y: Array[Byte]): java.lang.Long = {
    val n = x.length
    if (y.length != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x(i).toLong * y(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }
}
