package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{NullType, StringType}

/** Analysis-time STRING-input validation for the engine's unary text
  * expressions. Spark's own expressions get this from
  * `ImplicitCastInputTypes`, but `AbstractDataType` is private[sql],
  * so expressions outside the spark package replicate the check —
  * without it a SQL call like `word_ngrams(doc_id, …)` analyzes fine
  * and then dies mid-job with an executor ClassCastException. */
trait RequiresStringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    self.child.dataType match {
      // NullType: a bare NULL literal is valid anywhere a string is
      // (mirrors the implicit cast Spark's own string functions get);
      // eval never runs on it — nullSafeEval short-circuits
      case StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${other.sql}")
    }
}
