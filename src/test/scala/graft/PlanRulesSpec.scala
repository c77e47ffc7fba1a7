package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Writer

/** Injected optimizer rules ([[graft.plans.DerivePartitionFilters]] via
  * GraftExtensions, which the shared spec session registers). */
class PlanRulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val factDir: String = {
    val dir = tmpDir("graft_dpf")
    val fact = Seq(
      (20240115, 1L, 5.0), (20240220, 2L, 6.0), (20240321, 3L, 7.0),
      (20250110, 4L, 8.0), (20250215, 5L, 9.0))
      .toDF("date_key", "location_key", "temp")
    Writer.writeMonthlyPartitioned(fact, "date_key", dir)
    dir
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("date_key range inside one year derives year AND month bounds") {
    val q = Writer.readPartitioned(spark, factDir)
      .filter(col("date_key") >= 20240110 && col("date_key") <= 20240225)
    val plan = optimized(q)
    assert(plan.contains("part_year"), plan)
    assert(plan.contains("part_month"), plan)
    // results are the original filter's — derived predicates only prune
    assert(q.select("location_key").as[Long].collect().toSet ===
      Set(1L, 2L))
    // pruning actually fired: only the two matching month partitions
    // survive into the scan
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(f =>
      f.contains("part_year=2024") &&
        (f.contains("part_month=1/") || f.contains("part_month=2/"))),
      files.mkString("\n"))
  }

  test("date_key equality derives exact year and month") {
    val q = Writer.readPartitioned(spark, factDir)
      .filter(col("date_key") === 20250215)
    val plan = optimized(q)
    assert(plan.contains("part_year"), plan)
    assert(plan.contains("part_month"), plan)
    assert(q.select("location_key").as[Long].collect().toSeq === Seq(5L))
  }

  test("cross-year range derives year bounds only; results unchanged") {
    val q = Writer.readPartitioned(spark, factDir)
      .filter(col("date_key") > 20240320 && col("date_key") < 20250201)
    assert(optimized(q).contains("part_year"))
    assert(q.select("location_key").as[Long].collect().toSet ===
      Set(3L, 4L))
  }

  test("rule is idempotent: derived year bound appears exactly once") {
    val q = Writer.readPartitioned(spark, factDir)
      .filter(col("date_key") >= 20240110 && col("date_key") <= 20240225)
    val plan = optimized(q)
    val hits = "part_year#\\d+ >= 2024".r.findAllIn(plan).length
    assert(hits === 1, plan)
  }

  test("frames without the partition columns are left untouched") {
    val df = Seq((20240115, 1L)).toDF("date_key", "v")
      .filter(col("date_key") >= 20240101)
    assert(!optimized(df).contains("part_year"))
    assert(df.count() === 1L)
  }

  test("mixed-lineage filter above a join must NOT derive (regression)") {
    // left side carries its own date_key (2024), right side the
    // monthly table's part_year=2023 partition columns; a window
    // function keeps the filter above the join so pushdown can't
    // rescue a bad derivation. Name-matching alone would inject
    // part_year >= 2024 against the RIGHT side and drop both rows.
    val dir = tmpDir("graft_dpf_mix")
    Writer.writeMonthlyPartitioned(
      Seq((20230601, 7L, 1.0), (20230701, 7L, 2.0))
        .toDF("date_key", "location_key", "temp"), "date_key", dir)
    val right = Writer.readPartitioned(spark, dir)
      .select(col("location_key"), col("part_year"), col("part_month"))
    val left = Seq((7L, 20240110), (7L, 20240220))
      .toDF("location_key", "date_key")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("location_key").orderBy("date_key")
    val q = left.join(right, "location_key")
      .withColumn("rn", row_number().over(w))
      .filter(col("date_key") >= 20240101)
    assert(q.count() === 4L, optimized(q))
  }
}
