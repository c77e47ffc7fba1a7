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

  test("simhash64/word_ngrams/sign_buckets stay inside WholeStageCodegen") {
    // round-9: these three were CodegenFallback, breaking whole-stage
    // fusion around every LSH/shingle projection — the dominant cost
    // of q19/q20. A "*(n)" prefix on the Project proves the generated
    // doGenCode path compiled and fused.
    def planOf(sql: String): String =
      spark.range(5)
        .select(expr(sql.replace("IN",
          "concat('a b c x', cast(id as string))")))
        .queryExecution.executedPlan.toString
    assert(planOf("simhash64(IN)").contains("*(1) Project [simhash64("))
    assert(planOf("word_ngrams(IN, 2, true)")
      .contains("*(1) Project [word_ngrams("))
    val sbPlan = spark.range(5)
      .select(expr("sign_buckets(array(cast(id as double), 1.0d), 4, 2)"))
      .queryExecution.executedPlan.toString
    assert(sbPlan.contains("*(1) Project [sign_buckets("))
    // codegen result == interpreted eval result (same static compute)
    val rows = spark.range(3)
      .selectExpr(
        "simhash64(concat('tok ', cast(id as string))) AS h",
        "word_ngrams(concat('a b c ', cast(id as string)), 2, true) AS g",
        "sign_buckets(array(cast(id as double), -1.0d), 4, 2) AS b")
      .collect()
    val viaEval = evalStr("tok 0",
      c => graft.analytics.Dedup.simHashHex(c)).asInstanceOf[String]
    assert(rows(0).getString(0) == viaEval)
    assert(rows(1).getSeq[String](1) == Seq("a b", "b c", "c 1"))
    assert(rows.map(_.getInt(2)).forall(b => b >= 0 && b < 16))
  }

  test("expression participates in constant folding") {
    // foldable literal input ⇒ Catalyst folds the call away entirely
    val plan = spark.sql("SELECT nfkc('ﬁve') AS v")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("five") && !plan.contains("nfkc("))
  }
}
