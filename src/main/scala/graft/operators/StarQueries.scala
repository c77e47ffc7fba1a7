package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.CleanFunctions

/** Star-schema analytical queries (SURVEY §2.5–2.7) over the TPC-H-ish
  * corpus. Each has a DuckDB oracle. Scale posture: dimensions
  * (region/nation/customer/part/supplier) are explicitly broadcast; only
  * the fact–fact joins (lineitem ⋈ orders) shuffle, on their natural key.
  */
object StarQueries {
  import Q._

  private val dec10 = DecimalType(10, 2)
  private val dec3 = DecimalType(3, 2)
  private def one = lit(new java.math.BigDecimal("1.00"))

  val all: Seq[Q] = Seq(

    // TPC-H Q1-style pricing summary: single scan + partial aggregation,
    // shuffle carries only |flag×status| groups.
    Q("q01_pricing_summary", Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2))) * (1.00 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ext = col("l_extendedprice").cast(dec10)
      val disc = col("l_discount").cast(dec3)
      val tax = col("l_tax").cast(dec3)
      li.filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec10)).cast("double").as("sum_qty"),
          sum(ext).cast("double").as("sum_base_price"),
          sum(ext * (one - disc)).cast("double").as("sum_disc_price"),
          sum(ext * (one - disc) * (one + tax)).cast("double")
            .as("sum_charge"),
          (sum(col("l_quantity").cast(dec10)).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Revenue rollup across the full dimension chain; every dim join is a
    // broadcast, so the only exchange is the lineitem⋈orders shuffle.
    Q("q02_revenue_by_nation", Some("""
      SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""")) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      // customer scales with SF — no hard broadcast hint (AQE/stats
      // pick the strategy); nation/region are constant-size dims
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(col("l_extendedprice").cast(dec10) *
            (one - col("l_discount").cast(dec3))).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // TPC-H Q4-style: correlated EXISTS as a left-semi join.
    Q("q03_order_priority", Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Referential-integrity style anti-join (SURVEY J3/J4): customers
    // with no orders.
    Q("q04_customers_without_orders", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Top-k by aggregate (SURVEY A5): TakeOrderedAndProject — no global
    // sort at scale.
    Q("q05_top_customers", Some("""
      SELECT c_custkey, c_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
        CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
      ORDER BY total_spent DESC, c_custkey
      LIMIT 10""")) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      // customer scales with SF — leave the join strategy to AQE/stats
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)))
          .cast("double").as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(10)
    },

    // Cross-join + CASE compatibility matrix — the
    // mv_location_crop_compatibility shape (SURVEY J2,
    // reference db/init/01-schema.sql:254-272).
    Q("q09_compat_matrix", Some("""
      SELECT r_name, p_brand,
        CASE WHEN (r_regionkey * 7 + ascii(substr(p_brand, length(p_brand), 1))) % 3 = 0 THEN 'HIGH'
             WHEN (r_regionkey * 7 + ascii(substr(p_brand, length(p_brand), 1))) % 3 = 1 THEN 'MEDIUM'
             ELSE 'LOW' END AS compatibility
      FROM region CROSS JOIN (SELECT DISTINCT p_brand FROM part) b
      ORDER BY r_name, p_brand""")) { (s, dir) =>
      val r = Tables.load(s, dir, "region")
      val brands = Tables.load(s, dir, "part").select("p_brand").distinct()
      val k = expr(
        "(r_regionkey * 7 + ascii(substr(p_brand, length(p_brand), 1))) % 3")
      // brands is a derived distinct set — AQE sizes it at runtime
      r.crossJoin(brands)
        .select(col("r_name"), col("p_brand"),
          when(k === 0, "HIGH").when(k === 1, "MEDIUM").otherwise("LOW")
            .as("compatibility"))
        .orderBy("r_name", "p_brand")
    },

    // Last-writer-wins dedup via row_number (SURVEY A9 / SCD1 upsert
    // building block).
    Q("q10_latest_order_per_customer", Some("""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) t
      WHERE rn = 1 ORDER BY o_custkey""")) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy("o_custkey")
    },

    // Freshness check (SURVEY A3) against a fixed reference date for
    // determinism.
    Q("q14_order_freshness", Some("""
      SELECT strftime(max(o_orderdate), '%Y-%m-%d') AS latest_order,
        CAST(datediff('day', CAST(max(o_orderdate) AS DATE), DATE '2026-01-01') AS BIGINT) AS age_days
      FROM orders""")) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .agg(
          date_format(max(col("o_orderdate")), "yyyy-MM-dd")
            .as("latest_order"),
          datediff(lit("2026-01-01").cast("date"),
            max(col("o_orderdate")).cast("date")).cast("long")
            .as("age_days"))
    },

    // F12 texture classifier over a synthetic (clay,sand,silt) triple —
    // exercises the normalized USDA cascade with a SQL oracle.
    Q("q15_texture_classes", Some("""
      SELECT texture, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT CASE
          WHEN sand_pct >= 85 AND silt_pct + clay_pct * 1.5 < 15 THEN 'Sand'
          WHEN silt_pct >= 80 AND clay_pct < 12 THEN 'Silt'
          WHEN clay_pct >= 40 THEN 'Clay'
          WHEN sand_pct >= 52 AND silt_pct + clay_pct * 2 < 50 THEN 'Sandy Loam'
          WHEN silt_pct >= 50 AND clay_pct < 27 THEN 'Silt Loam'
          WHEN clay_pct >= 27 AND clay_pct < 40 AND sand_pct > 20 THEN 'Clay Loam'
          ELSE 'Loam' END AS texture
        FROM (
          SELECT clay / (clay + sand + silt) * 100 AS clay_pct,
                 sand / (clay + sand + silt) * 100 AS sand_pct,
                 silt / (clay + sand + silt) * 100 AS silt_pct
          FROM (SELECT l_partkey % 45 + 5 AS clay,
                       (l_suppkey * 9) % 90 + 5 AS sand,
                       l_orderkey % 50 + 5 AS silt
                FROM lineitem) raw) pct) cls
      GROUP BY texture ORDER BY texture""")) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select((col("l_partkey") % 45 + 5).as("clay"),
          (col("l_suppkey") * 9 % 90 + 5).as("sand"),
          (col("l_orderkey") % 50 + 5).as("silt"))
      li.select(CleanFunctions
          .inferTexture(col("clay"), col("sand"), col("silt")).as("texture"))
        .groupBy("texture").agg(count(lit(1)).as("n"))
        .orderBy("texture")
    },

    // W1 location-hash determinism: md5 over "%.6f,%.6f"
    // (etl/transform/transformers.py:77-79).
    Q("q16_location_hash", Some("""
      SELECT c_custkey,
        md5(printf('%.6f,%.6f', c_acctbal, CAST(c_nationkey AS DOUBLE))) AS location_hash
      FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          CleanFunctions.locationHash(col("c_acctbal"), col("c_nationkey"))
            .as("location_hash"))
        .orderBy("c_custkey")
    }
  )
}
