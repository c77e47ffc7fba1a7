package graft

import org.apache.spark.sql.functions._

/** The engine's SQL surface (SURVEY §3.3): corpus tables registered as
  * views, queries run through `spark.sql`, results equal to the
  * DataFrame forms — Catalyst handles parse→analyze→optimize
  * identically for both APIs.
  */
class SqlSurfaceSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("registered views answer SQL equal to the DataFrame plans") {
    Tables.registerAll(spark, dir)
    val sqlQ1 = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""").collect()
    val dfQ1 = SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .select("l_returnflag", "l_linestatus", "count_order").collect()
    assert(sqlQ1.map(_.toSeq).toSeq == dfQ1.map(_.toSeq).toSeq)
  }

  test("SQL window + anti-join forms work over the views") {
    Tables.registerAll(spark, dir)
    val spikes = spark.sql("""
      SELECT count(*) FROM (
        SELECT value - lag(value) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS d FROM events)
      WHERE abs(d) > 150""").collect()(0).getLong(0)
    val dfSpikes = SparkEntry.queries("q06_value_spike")(spark, dir).count()
    assert(spikes == dfSpikes)

    val orphans = spark.sql("""
      SELECT count(*) FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey)""")
      .collect()(0).getLong(0)
    assert(orphans ==
      SparkEntry.queries("q04_customers_without_orders")(spark, dir)
        .count())
  }

  test("sign_buckets SQL function equals the Column API and rejects " +
      "non-literal parameters") {
    import spark.implicits._
    Tables.registerAll(spark, dir)
    val viaSql = spark.sql("""
      SELECT vec_id, sign_buckets(CAST(embedding AS ARRAY<DOUBLE>),
        8, 64, 42) AS b
      FROM embeddings ORDER BY vec_id""").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val viaApi = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        graft.analytics.Similarity.signBucket(col("embedding"),
          bits = 8, dim = 64, seed = 42L).as("b"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
    val e = intercept[Exception] {
      spark.sql("""SELECT sign_buckets(CAST(embedding AS ARRAY<DOUBLE>),
        CAST(vec_id AS INT), 64) FROM embeddings""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be a literal")))
  }

  test("residual_sign_buckets SQL function equals the Column API") {
    Tables.registerAll(spark, dir)
    // residual against a fixed reference vector: SQL text vs the
    // Column API must bucket identically (same seeded hyperplanes,
    // same fold-difference arithmetic)
    val refSql = (0 until 64).map(d => s"CAST(0.25 * $d AS DOUBLE)")
      .mkString("array(", ", ", ")")
    val viaSql = spark.sql(s"""
      SELECT vec_id, residual_sign_buckets(
        CAST(embedding AS ARRAY<DOUBLE>), $refSql, 6, 64, 7) AS rb
      FROM embeddings ORDER BY vec_id""").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val refCol = org.apache.spark.sql.functions.array(
      (0 until 64).map(d => lit(0.25 * d)): _*)
    val viaApi = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        graft.analytics.Similarity.residualSignBucket(
          col("embedding"), refCol, bits = 6, dim = 64, seed = 7L)
          .as("rb"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
    // non-literal bits rejected at analysis time
    val e = intercept[Exception] {
      spark.sql(s"""SELECT residual_sign_buckets(
        CAST(embedding AS ARRAY<DOUBLE>), $refSql,
        CAST(vec_id AS INT), 64) FROM embeddings""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be a literal")))
  }

  test("sketch aggregates via SQL equal the Column API and enforce " +
      "literal shape parameters") {
    Tables.registerAll(spark, dir)
    import graft.analytics.{Dedup, Sketches}
    val p = Dedup.P
    // kmv_distinct / hll_distinct: SQL text vs Sketches.* per group
    val viaSql = spark.sql(s"""
      SELECT event_type,
        kmv_distinct(CAST(conv(substring(md5(CAST(user_id AS STRING)),
          1, 8), 16, 10) AS BIGINT) % ${p}L, 16) AS kmv,
        hll_distinct(CAST(conv(substring(md5(CAST(user_id AS STRING)),
          1, 15), 16, 10) AS BIGINT), 4) AS hll
      FROM events WHERE user_id IS NOT NULL
      GROUP BY event_type ORDER BY event_type""").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val viaApi = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(
        Sketches.kmvDistinct(
          Dedup.h30(col("user_id").cast("string")), 16).as("kmv"),
        Sketches.hllDistinct(
          Dedup.h60(col("user_id").cast("string")), 4).as("hll"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(viaSql.toSeq === viaApi.toSeq)
    // cms_sketch: counters identical between SQL and Column builds
    val skSql = spark.sql(s"""
      SELECT cms_sketch(CAST(conv(substring(md5(CAST(user_id AS
        STRING)), 1, 8), 16, 10) AS BIGINT) % ${p}L, 2, 32) AS sk
      FROM events WHERE user_id IS NOT NULL""").collect()(0).getSeq[Long](0)
    val skApi = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id").isNotNull)
      .agg(Sketches.cmsSketch(
        Dedup.h30(col("user_id").cast("string")), 2, 32).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(skSql === skApi)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // analysis-time rejection: non-literal k, out-of-range b
    val e1 = intercept[Exception] {
      spark.sql("""SELECT kmv_distinct(user_id, CAST(user_id AS INT))
        FROM events""").collect()
    }
    assert(msgs(e1).exists(_.contains("must be a literal")))
    val e2 = intercept[Exception] {
      spark.sql("SELECT hll_distinct(user_id, 99) FROM events")
        .collect()
    }
    assert(msgs(e2).exists(_.contains("must be in [4, 16]")))
    // type check: unhashed (non-LONG) input is a named analysis error
    val e3 = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(event_type, 16) FROM events")
        .collect()
    }
    assert(msgs(e3).exists(_.contains("pre-hashed LONG")))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
