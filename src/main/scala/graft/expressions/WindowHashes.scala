package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 k-token window hashes of a token array in ONE compiled
  * pass: element i is the md5 hex of `tokens[i..i+k-1]` joined by a
  * single space — byte-identical to
  * `transform(sequence(0, n-k), i -> md5(array_join(slice(toks, i+1, k), " ")))`,
  * which is what the substring-dedup pass (q111) evaluates per window.
  * The HOF formulation interprets its lambda per element (ArrayTransform
  * is not whole-stage-codegen'd) and re-slices a fresh array per
  * window; this loop reuses one byte buffer and one MessageDigest per
  * row. Empty array when the input has fewer than k tokens or is null
  * (the caller filters those rows; totals are unaffected).
  */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"window_hashes needs k >= 1, got $k")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"window_hashes needs ARRAY<STRING>, got ${other.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else WindowHashes.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (${c.isNull}) {
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
      } else {
        ${ev.value} = graft.expressions.WindowHashes.compute(${c.value}, $k);
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WindowHashes = copy(child = newChild)
}

object WindowHashes {

  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // token bytes once; a null element mirrors array_join's skip
    // semantics closely enough to be unreachable here (split() never
    // produces null tokens) but must not NPE
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) =
        if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    var pos = 0
    while (pos <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(pos + j))
        j += 1
      }
      val digest = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((digest(b) >> 4) & 0xF).toByte
        hex(2 * b + 1) = HexDigits(digest(b) & 0xF).toByte
        b += 1
      }
      out(pos) = UTF8String.fromBytes(hex)
      pos += 1
    }
    new GenericArrayData(out)
  }
}
