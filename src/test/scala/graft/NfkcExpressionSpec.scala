package graft

import org.apache.spark.sql.functions._
import graft.functions.TextClean

/** The native NFKC expression: SQL registration via
  * SparkSessionExtensions, codegen execution, equivalence with the UDF
  * form. */
class NfkcExpressionSpec extends SparkSpec {

  test("nfkc registered via extensions, works in SQL") {
    assert(spark.sql("SELECT nfkc('① ﬁ') AS v")
      .collect()(0).getString(0) == "1 fi")
    assert(spark.sql("SELECT nfkc(NULL) AS v").collect()(0).get(0) == null)
  }

  test("expression equals the UDF over sample strings") {
    import spark.implicits._
    val samples = Seq("plain ascii", "ﬁve ① ②", "°C µm", "",
      "ｈａｌｆ　ｗｉｄｔｈ")
    val df = samples.toDF("s")
      .select(call_function("nfkc", col("s")).as("e"),
        TextClean.nfkc(col("s")).as("u"))
    assert(df.filter(!(col("e") <=> col("u"))).count() == 0)
  }

  test("expression path stays inside WholeStageCodegen") {
    val plan = spark.range(5)
      .select(call_function("nfkc",
        concat(lit("x"), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1) Project [nfkc("))
  }

  test("expression participates in constant folding") {
    // foldable literal input ⇒ Catalyst folds the call away entirely
    val plan = spark.sql("SELECT nfkc('ﬁve') AS v")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("five") && !plan.contains("nfkc("))
  }
}
