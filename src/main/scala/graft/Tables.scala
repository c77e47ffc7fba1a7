package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-provided corpus
  * (`/root/testdata/sf*`, see TESTDATA.md). Column pruning and filter
  * pushdown happen automatically because these are plain declarative
  * parquet scans — at 100 TB each of these becomes a partitioned,
  * statistics-pruned distributed scan with no code change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and floor-truncate
    * to microseconds — exactly what DuckDB does when it reads the same
    * file, so oracle comparisons see identical instants.
    *
    * The conf is deliberately left set on the session (not
    * save/restored): it is consulted again when the lazy scan executes,
    * so restoring it right after this call would break the very read it
    * enabled. Session-wide effect: any OTHER nanos-timestamped parquet
    * read through the same session also surfaces raw longs — in this
    * engine every corpus read routes through [[load]], and `events` is
    * the only nanos table.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view so `spark.sql` works against
    * the same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
