package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Multi-hyperplane sign-LSH bucket id of an array<double> vector as
  * one native expression: `bits` seeded ±1 hyperplane projections in a
  * single compiled pass. The equivalent `Column` formulation is a
  * ~(bits·dim·3)-node expression tree — ~1500 interpreted node
  * evaluations per row at 8×64, measured as the dominant cost of the
  * LSH queries at sf0.1; this loop is the same arithmetic in two
  * nested `while`s.
  *
  * Bit-compatible with the tree formulation and the DuckDB
  * `list_reduce` mirror: per bit, the projection is the left-fold
  * `e₀·s₀ + e₁·s₁ + …` in identical IEEE order (each term is a sign
  * flip, exact in floating point), bit i contributes `1 << i` iff the
  * fold is ≥ 0 — where a NaN fold COUNTS as ≥ 0, because BOTH SQL
  * engines order NaN above all doubles (`NaN >= 0` is true in Spark
  * SQL and DuckDB; Java's primitive compare would say false, so the
  * loop tests NaN explicitly). Null parity with the tree: a null
  * array or a null element made every per-bit fold null, every `when`
  * take its 0 branch, and the SUM of those zeros is 0 — never null —
  * so this expression is non-nullable and returns 0 for those inputs.
  * A vector SHORTER than `dim` fails loudly instead: the tree's
  * null-collapse would silently bucket every such row to 0, and a
  * dim-mismatched corpus collapsing into ONE bucket turns the LSH
  * equi-join into the all-pairs scan it exists to avoid — at scale an
  * undiagnosed shuffle blowup, not a correctness error, which is the
  * worst kind.
  */
case class SignBuckets(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression {

  private val bits = signs.length
  private val dim = if (signs.isEmpty) 0 else signs.head.length
  require(bits >= 1 && bits <= 31 && dim >= 1,
    s"sign_buckets: needs 1..31 hyperplanes over >=1 dims, got " +
      s"bits=$bits dim=$dim (0 hyperplanes would put every row in " +
      "bucket 0 — the LSH join silently all-pairs)")
  require(signs.forall(_.length == dim),
    "sign_buckets: ragged hyperplane matrix")
  @transient private lazy val flat: Array[Double] = signs.flatten.toArray

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_buckets needs ARRAY<DOUBLE>, got ${other.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else SignBuckets.compute(v.asInstanceOf[ArrayData], flat, bits, dim)
  }

  /** Static call into [[SignBuckets.compute]] so the bucket loop stays
    * inside WholeStageCodegen and the enclosing projection keeps
    * fusing (the CodegenFallback version broke the stage around every
    * LSH projection — the dominant cost of q19/q20 at sf0.1). The
    * hyperplane matrix rides along as a codegen reference object, NOT
    * inlined source: at 8×64 it would be a 512-literal array
    * initializer re-parsed per compile. Null input takes the
    * constant-0 branch exactly as [[eval]]. */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", flat, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        ${ev.value} = graft.expressions.SignBuckets.compute(
          ${c.value}, $signsRef, $bits, $dim);
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignBuckets = copy(child = newChild)
}

object SignBuckets {
  /** Seeded Rademacher (±1) hyperplane signs, `bits` rows × `dim`
    * columns — the one generator shared by the Column API
    * ([[graft.analytics.Similarity.signBucket]]), the SQL function
    * (`sign_buckets`), and the oracle-SQL mirror, so every consumer
    * buckets identically. */
  def hyperplaneSigns(bits: Int, dim: Int,
      seed: Long = 42L): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** 0 when the vector carries a null element (the tree formulation's
    * null-collapse — see class doc); an error when it is shorter than
    * `dim`; otherwise the OR of `1 << b` over hyperplanes with
    * fold ≥ 0 (NaN counts as ≥ 0, the SQL ordering). */
  def compute(arr: ArrayData, signs: Array[Double], bits: Int,
      dim: Int): Int = {
    val n = arr.numElements()
    require(n >= dim,
      s"sign_buckets: vector has $n dims, hyperplanes need $dim — a " +
        "dim mismatch would silently collapse every row into bucket 0 " +
        "and degrade the LSH join to all-pairs")
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return 0
      j += 1
    }
    var bucket = 0
    var b = 0
    while (b < bits) {
      val off = b * dim
      var dot = arr.getDouble(0) * signs(off)
      var i = 1
      while (i < dim) {
        dot += arr.getDouble(i) * signs(off + i)
        i += 1
      }
      if (dot >= 0 || java.lang.Double.isNaN(dot)) bucket |= 1 << b
      b += 1
    }
    bucket
  }
}
