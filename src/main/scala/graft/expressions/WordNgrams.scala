package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text value as a native Catalyst
  * expression: the whole tokenize → slide → join (→ dedup) pipeline
  * runs per row in one compiled loop.
  *
  * Semantics are identical to the Column formulation it replaces
  * (`array_distinct(transform(sequence(1, size(toks)-n+1),
  * i -> array_join(slice(toks, i, n), " ")))` over
  * `split(trim(text), "\s+")`), which is interpreted per element —
  * HOFs get neither codegen nor CSE, and the slice/join allocations
  * made the shingle-index build the dominant cost of every
  * shingle-based dedup query (measured ~4 s of q19's 8 s at sf0.1).
  * `doGenCode` emits a static call to [[WordNgrams.compute]] so the
  * shingle projection additionally stays inside WholeStageCodegen
  * instead of forcing its stage interpreted.
  *
  *   - tokens: ASCII-space trim (exactly Spark's/DuckDB's `trim`,
  *     narrower than java.lang.String#trim), then regex `\s+` split
  *     keeping leading empties — byte-for-byte the oracle's
  *     `string_split_regex(trim(text), '\s+')`;
  *   - n-grams joined with a single space, position order;
  *   - `distinct = true` keeps the FIRST occurrence order, exactly
  *     `array_distinct`;
  *   - fewer than `n` tokens → empty array (callers explode, so the
  *     row simply contributes nothing).
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with RequiresStringInput {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordNgrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

object WordNgrams {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val empty = new GenericArrayData(new Array[Any](0))

  /** Shared by eval and generated code (static forwarder). Declared
    * [[ArrayData]] so the generated assignment matches the codegen
    * java type for ARRAY<STRING>. */
  def compute(input: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val text = input.toString
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val toks = ws.split(text.substring(start, end), -1)
    val count = toks.length - n + 1
    if (count <= 0) return empty
    val sb = new java.lang.StringBuilder(64)
    if (distinct) {
      // LinkedHashSet = first-occurrence order, as array_distinct
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) {
        out(k) = UTF8String.fromString(it.next())
        k += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry point — the one place the ColumnBridge idiom
    * for this expression lives. */
  def column(c: org.apache.spark.sql.Column, n: Int,
      distinct: Boolean): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WordNgrams(
      org.apache.spark.sql.graft.ColumnBridge.expression(c), n, distinct))
}
