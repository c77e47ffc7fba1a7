package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text value as a 16-char hex string, as a native
  * Catalyst expression — the whole tokenize → md5 → 64-bit vote →
  * fingerprint computation runs per row in compiled code, so SimHash
  * is map-only with zero exchange at any corpus size.
  *
  * Semantics (shared with the DuckDB oracle and the round-1 shuffle
  * formulation): tokens are `split(trim(text), "\\s+")` — ASCII-space
  * trim exactly as Spark's/DuckDB's `trim`, regex split keeping
  * leading empties; every token *occurrence* votes ±1 per bit of the
  * first 64 bits of `md5(token)` (hex chars MSB-first); fingerprint
  * bit j is set iff vote j is strictly positive.
  *
  * Why not a `Column`-expression fold: an `aggregate` HOF over the
  * token array is interpreted and allocates a 64-wide array per token
  * (measured 3.5× *slower* than the groupBy shuffle at sf0.1), while
  * this compiled loop beats both. `doGenCode` emits a static call to
  * [[SimHash64.compute]], so the fingerprint projection stays fused
  * with the surrounding whole-stage-codegen'd plan instead of forcing
  * the enclosing stage into interpreted mode.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with RequiresStringInput {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val hex = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)
  // one digest instance per executor thread — getInstance() per row
  // would put a JCA provider lookup in the hot loop (digest() resets
  // the instance after each token, so reuse is safe)
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by eval and generated code (static forwarder). */
  def compute(input: UTF8String): UTF8String = {
    val text = input.toString
    // trim ASCII spaces only (Spark/DuckDB trim semantics, narrower
    // than java.lang.String#trim which strips all chars <= 0x20)
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val toks = ws.split(text.substring(start, end), -1)
    val votes = new Array[Int](64)
    val md = md5.get()
    var i = 0
    while (i < toks.length) {
      val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        votes(j) += (((d(j >> 3) >> (7 - (j & 7))) & 1) << 1) - 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var n = 0
    while (n < 16) {
      var nib = 0
      var b = 0
      while (b < 4) {
        if (votes(n * 4 + b) > 0) nib |= 1 << (3 - b)
        b += 1
      }
      out(n) = hex(nib)
      n += 1
    }
    UTF8String.fromBytes(out)
  }
}
