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

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
