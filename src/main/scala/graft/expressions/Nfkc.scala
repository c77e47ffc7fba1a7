package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFKC unicode normalization as a native Catalyst expression
  * (SURVEY §2.9 T1). The cleaning pipeline's default is a Scala UDF;
  * this is the codegen'd upgrade path — `doGenCode` emits a direct
  * `java.text.Normalizer` call inside WholeStageCodegen, so the hot
  * path has no UDF serialization boundary and stays fused with the
  * surrounding expressions.
  */
case class Nfkc(child: Expression) extends UnaryExpression
    with RequiresStringInput {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFKC))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFKC))")

  override protected def withNewChildInternal(newChild: Expression): Nfkc =
    copy(child = newChild)
}

/** Engine extension entry point: register with
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (or
  * `.withExtensions`) and `nfkc(...)` becomes available to SQL and to
  * `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("nfkc"),
      new ExpressionInfo(classOf[Nfkc].getName, "nfkc"),
      (children: Seq[Expression]) => Nfkc(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => children match {
        case Seq(c, n, d) =>
          // n/distinct parameterize the expression itself, so they
          // must be non-null literals — reject clearly at analysis
          // time (a bare eval() would NPE on NULL and silently unbox
          // a null distinct to false)
          def litArg(e: Expression, what: String): Any = {
            if (!e.foldable) throw new IllegalArgumentException(
              s"word_ngrams: $what must be a literal")
            val v = e.eval()
            if (v == null) throw new IllegalArgumentException(
              s"word_ngrams: $what must not be NULL")
            v
          }
          val nV = litArg(n, "n") match {
            case num: Number => num.intValue()
            case other => throw new IllegalArgumentException(
              s"word_ngrams: n must be an integer, got $other")
          }
          val dV = litArg(d, "distinct") match {
            case b: Boolean => b
            case other => throw new IllegalArgumentException(
              s"word_ngrams: distinct must be a boolean, got $other")
          }
          WordNgrams(c, nV, dV)
        case other => throw new IllegalArgumentException(
          s"word_ngrams expects (text, n, distinct), got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSim(a, b)
        case other => throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotLong(a, b)
        case other => throw new IllegalArgumentException(
          s"dot_long expects 2 arguments, got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("pack_i8"),
      new ExpressionInfo(classOf[PackI8].getName, "pack_i8"),
      (children: Seq[Expression]) => children match {
        case Seq(a) => PackI8(a)
        case other => throw new IllegalArgumentException(
          s"pack_i8 expects 1 argument, got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[DotI8].getName, "dot_i8"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotI8(a, b)
        case other => throw new IllegalArgumentException(
          s"dot_i8 expects 2 arguments, got ${other.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (children: Seq[Expression]) => children match {
        // sign_buckets(emb, bits, dim[, seed]) — bits/dim/seed
        // parameterize the hyperplane matrix, so they must be
        // non-null literals (same analysis-time contract as
        // word_ngrams)
        case args if args.length == 3 || args.length == 4 =>
          def litInt(e: Expression, what: String): Long = {
            if (!e.foldable) throw new IllegalArgumentException(
              s"sign_buckets: $what must be a literal")
            e.eval() match {
              case n: Number => n.longValue()
              case other => throw new IllegalArgumentException(
                s"sign_buckets: $what must be an integer, got $other")
            }
          }
          val bits = litInt(args(1), "bits").toInt
          val dim = litInt(args(2), "dim").toInt
          require(bits >= 0 && bits <= 31,
            s"sign_buckets: bits must be in [0, 31], got $bits")
          val seed =
            if (args.length == 4) litInt(args(3), "seed") else 42L
          SignBuckets(args.head,
            SignBuckets.hyperplaneSigns(bits, dim, seed))
        case other => throw new IllegalArgumentException(
          s"sign_buckets expects (emb, bits, dim[, seed]), got " +
            s"${other.length} arguments")
      }))
  }
}
