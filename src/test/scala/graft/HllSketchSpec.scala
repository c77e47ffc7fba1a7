package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Sketches}

/** HyperLogLog distinct sketch: exactness of the register/estimate
  * arithmetic, error bounds, merge determinism under partitioning,
  * and the constant-state contract. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within the 1.04/sqrt(m) error band on 10k distincts") {
    val n = 10000
    val est = spark.range(n).toDF("id")
      .agg(Sketches.hllDistinct(Dedup.h60($"id".cast("string")))
        .as("e")).collect()(0).getDouble(0)
    // b = 8 -> sigma ~ 6.5%; allow 4 sigma.
    assert(math.abs(est - n) < 4 * 0.065 * n,
      s"estimate $est too far from $n")
  }

  test("small-range branch: low cardinalities come back near-exact") {
    val est = spark.range(20).toDF("id")
      .agg(Sketches.hllDistinct(Dedup.h60($"id".cast("string")))
        .as("e")).collect()(0).getDouble(0)
    // linear counting at 20/256 occupancy is near-exact
    assert(math.abs(est - 20) < 2.0, s"estimate $est not ~20")
  }

  test("partitioning-insensitive: same estimate at 1 and 13 partitions") {
    val df = spark.range(5000).toDF("id")
      .select(Dedup.h60($"id".cast("string")).as("h"))
    val e1 = df.coalesce(1).agg(Sketches.hllDistinct($"h").as("e"))
      .collect()(0).getDouble(0)
    val e13 = df.repartition(13).agg(Sketches.hllDistinct($"h").as("e"))
      .collect()(0).getDouble(0)
    assert(e1 == e13)
  }

  test("duplicates do not move the estimate") {
    val base = spark.range(1000).toDF("id")
    val dup = base.union(base).union(base)
    val e1 = base.agg(Sketches.hllDistinct(
      Dedup.h60($"id".cast("string"))).as("e")).collect()(0).getDouble(0)
    val e3 = dup.agg(Sketches.hllDistinct(
      Dedup.h60($"id".cast("string"))).as("e")).collect()(0).getDouble(0)
    assert(e1 == e3)
  }

  test("nulls are skipped, empty group estimates 0") {
    val est = Seq[Option[String]](None, None).toDF("s")
      .agg(Sketches.hllDistinct(
        when($"s".isNotNull, Dedup.h60($"s"))).as("e"))
      .collect()(0).getDouble(0)
    assert(est == 0.0)
  }

  test("non-long input fails at analysis with a named error") {
    val e = intercept[Exception] {
      Seq("a").toDF("s").agg(Sketches.hllDistinct($"s")).collect()
    }
    assert(e.getMessage.contains("hll_distinct"))
  }

  test("grouped: per-group registers never mix") {
    val df = (0 until 3000).map(i => (i % 3, i)).toDF("g", "id")
    val got = df.groupBy("g")
      .agg(Sketches.hllDistinct(Dedup.h60($"id".cast("string")))
        .as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    got.values.foreach(e =>
      assert(math.abs(e - 1000) < 4 * 0.065 * 1000, s"group est $e"))
  }
}
