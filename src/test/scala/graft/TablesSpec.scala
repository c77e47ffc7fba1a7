package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader-contract spec: `Tables.load` must dispatch on the schema it
  * actually read (the driver regenerated `/root/testdata` mid-run once,
  * flipping `events.ts` from TIMESTAMP(NANOS) to `timestamp[us]`, which
  * silently broke 22 queries in round 10) and must fail with one
  * diagnosable error naming table/column/type when the corpus drifts to
  * a shape the engine cannot normalize.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events loads from the driver corpus with ts as session-UTC TimestampType") {
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }

  test("events with raw nanos longs (pre-regeneration encoding) converts to the same instants") {
    import spark.implicits._
    val dir = tmpDir("graft-nanos-events")
    // 2021-03-02T01:02:03.123456789 UTC as epoch nanos; micros floor-truncates
    val nanos = 1614646923123456789L
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got == "2021-03-02 01:02:03.123456")
  }

  test("events with an un-normalizable ts type fails with a named, single error") {
    import spark.implicits._
    val dir = tmpDir("graft-bad-events")
    Seq((1L, "2021-03-02", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("StringType"))
  }

  test("nanosAsLong left set by loadEvents does not disturb later reads") {
    import spark.implicits._
    // the loader's documented contract: the legacy conf stays set on
    // the session (the lazy events scan re-consults it at execution
    // time) and is a NO-OP for every non-nanos file — prove both by
    // reading a normal micros-timestamp parquet after an events load
    Tables.load(spark, sfDir, "events").count()
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    val dir = tmpDir("graft-post-events-read")
    val t = java.sql.Timestamp.valueOf("2022-05-01 10:20:30.123456")
    Seq((1L, t)).toDF("id", "when")
      .write.mode("overwrite").parquet(s"$dir/plain.parquet")
    val back = spark.read.parquet(s"$dir/plain.parquet")
    // an ordinary timestamp column still reads as a timestamp (NOT
    // raw longs) with the same instant
    assert(back.schema("when").dataType.isInstanceOf[TimestampType] ||
      back.schema("when").dataType.isInstanceOf[TimestampNTZType])
    assert(back.select(col("when").cast(TimestampType)).as[java.sql.Timestamp]
      .head() == t)
  }

  test("a table missing an expected column fails naming the table and column") {
    import spark.implicits._
    val df = Seq((1, "EUROPE")).toDF("r_regionkey", "r_wrong_name")
    val e = intercept[IllegalArgumentException] {
      Tables.assertSchema("region", df)
    }
    assert(e.getMessage.contains("'region'"))
    assert(e.getMessage.contains("'r_name'"))
  }

  test("a table with a drifted column type fails naming the found type") {
    import spark.implicits._
    val df = Seq(("1", "EUROPE")).toDF("r_regionkey", "r_name")
    val e = intercept[IllegalArgumentException] {
      Tables.assertSchema("region", df)
    }
    assert(e.getMessage.contains("'r_regionkey'"))
    assert(e.getMessage.contains("string"))
  }

  test("every driver corpus table passes the schema assertion") {
    Tables.names.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      assert(df.columns.nonEmpty, t)
    }
  }
}
