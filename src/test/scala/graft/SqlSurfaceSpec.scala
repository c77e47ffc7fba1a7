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

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
