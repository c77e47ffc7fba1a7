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

  test("simhash64 and cosine_sim registered in the SQL surface") {
    // same text -> same fingerprint; SQL form matches the Column form
    val viaSql = spark.sql("SELECT simhash64('wheat needs sun') AS v")
      .collect()(0).getString(0)
    val viaCol = evalStr("wheat needs sun",
      c => graft.analytics.Dedup.simHashHex(c)).asInstanceOf[String]
    assert(viaSql == viaCol && viaSql.length == 16)
    assert(spark.sql("SELECT simhash64(NULL) AS v")
      .collect()(0).get(0) == null)
    // cosine of identical vectors is 1.0; orthogonal is 0.0; null on
    // length mismatch (no NPE despite non-nullable literal children)
    val r = spark.sql("""SELECT
        cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS same,
        cosine_sim(array(1.0d, 0.0d), array(0.0d, 3.0d)) AS orth,
        cosine_sim(array(1.0d, 2.0d), array(1.0d)) AS mismatch""")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getDouble(1) == 0.0)
    assert(r.get(2) == null)
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
