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

  /** Analysis-time extraction of a literal argument that parameterizes
    * an expression (ngram size, hyperplane bits/dim/seed): rejects
    * non-foldable and NULL arguments with a clear message — a bare
    * `eval()` would NPE on NULL or silently unbox garbage. Shared by
    * every injected function that takes shape parameters. */
  private def litArg(fn: String, e: Expression, what: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $what must be a literal")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn: $what must not be NULL")
    v
  }

  /** [[litArg]] narrowed to a RANGE-CHECKED int: the Long is validated
    * before truncation, so a value like 2³² cannot silently wrap to 0
    * (for sign_buckets that wrap would mean zero hyperplanes — every
    * row in bucket 0, the LSH join silently all-pairs). */
  private def litInt(fn: String, e: Expression, what: String,
      lo: Int, hi: Int): Int = litArg(fn, e, what) match {
    case n: Number =>
      val v = n.longValue()
      if (v < lo || v > hi) throw new IllegalArgumentException(
        s"$fn: $what must be in [$lo, $hi], got $v")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer, got $other")
  }

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
          val nV = litInt("word_ngrams", n, "n", 1, 1000)
          val dV = litArg("word_ngrams", d, "distinct") match {
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
          val bits = litInt("sign_buckets", args(1), "bits", 1, 31)
          val dim = litInt("sign_buckets", args(2), "dim", 1, 65536)
          val seed =
            if (args.length == 4) litArg("sign_buckets", args(3),
                "seed") match {
              case n: Number => n.longValue()
              case other => throw new IllegalArgumentException(
                s"sign_buckets: seed must be an integer, got $other")
            }
            else 42L
          SignBuckets(args.head,
            SignBuckets.hyperplaneSigns(bits, dim, seed))
        case other => throw new IllegalArgumentException(
          s"sign_buckets expects (emb, bits, dim[, seed]), got " +
            s"${other.length} arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("residual_sign_buckets"),
      new ExpressionInfo(classOf[ResidualSignBuckets].getName,
        "residual_sign_buckets"),
      (children: Seq[Expression]) => children match {
        // residual_sign_buckets(emb, cent, bits, dim[, seed]) — the
        // within-cell splitter of the two-level semantic tier, SQL
        // surface of Similarity.residualSignBucket (same
        // analysis-time literal contract as sign_buckets)
        case args if args.length == 4 || args.length == 5 =>
          val bits =
            litInt("residual_sign_buckets", args(2), "bits", 1, 31)
          val dim =
            litInt("residual_sign_buckets", args(3), "dim", 1, 65536)
          val seed =
            if (args.length == 5) litArg("residual_sign_buckets",
                args(4), "seed") match {
              case n: Number => n.longValue()
              case other => throw new IllegalArgumentException(
                "residual_sign_buckets: seed must be an integer, " +
                  s"got $other")
            }
            else 42L
          ResidualSignBuckets(args(0), args(1),
            SignBuckets.hyperplaneSigns(bits, dim, seed))
        case other => throw new IllegalArgumentException(
          "residual_sign_buckets expects (emb, cent, bits, dim" +
            s"[, seed]), got ${other.length} arguments")
      }))
    // Sketch aggregates for the SQL-only consumer (the DataFrame
    // surface is graft.analytics.Sketches): each is a bounded-state
    // TypedImperativeAggregate — the analyzer wraps the returned
    // AggregateFunction in an AggregateExpression. Shape parameters
    // are analysis-time literals (same contract as sign_buckets).
    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_distinct"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => HllSketch(c, 8)
        case Seq(c, b) =>
          HllSketch(c, litInt("hll_distinct", b, "b", 4, 16))
        case other => throw new IllegalArgumentException(
          s"hll_distinct expects (hash60[, b]), got ${other.length} " +
            "arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_distinct"),
      (children: Seq[Expression]) => children match {
        case Seq(c, k) =>
          KmvSketch(c, litInt("kmv_distinct", k, "k", 2, 1 << 20),
            graft.analytics.Dedup.P)
        case other => throw new IllegalArgumentException(
          s"kmv_distinct expects (hash30, k), got ${other.length} " +
            "arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
      (children: Seq[Expression]) => children match {
        case Seq(c, d, w) =>
          CmsSketch(c, litInt("cms_sketch", d, "d", 1, 16),
            litInt("cms_sketch", w, "w", 2, 1 << 24))
        case other => throw new IllegalArgumentException(
          s"cms_sketch expects (hash30, d, w), got ${other.length} " +
            "arguments")
      }))
    // optimizer rule: date_key range filters over the monthly lake
    // layout gain the implied part_year/part_month predicates, so
    // partition pruning fires without hand-written partition filters
    ext.injectOptimizerRule(_ => graft.plans.DerivePartitionFilters)
  }
}
