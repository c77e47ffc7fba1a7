package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs, plus single-value evaluation
  * helpers. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.functions._

  /** A spec-scoped temp directory, deleted on JVM exit — specs were
    * leaving one `graft-*` dir per `Files.createTempDirectory` call
    * in /tmp across runs; routing through here bounds the debris to
    * the test JVM's lifetime. */
  def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(tag)
    SparkSpec.cleanupOnExit(p)
    p.toString
  }

  /** Evaluate a Column over a single empty row. */
  def eval(c: Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  /** Evaluate a Column over one row with a string input column `s`. */
  def evalStr(input: String, f: Column => Column): Any = {
    import spark.implicits._
    Seq(input).toDF("s").select(f(col("s")).as("v")).collect()(0).get(0)
  }

  /** Evaluate a Column over one row with a double input column `x`. */
  def evalNum(input: java.lang.Double, f: Column => Column): Any = {
    import spark.implicits._
    Seq(Option(input).map(_.doubleValue)).toDF("x")
      .select(f(col("x")).as("v")).collect()(0).get(0)
  }
}

object SparkSpec {
  private val tracked =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tracked.forEach(graft.util.Scratch.deleteTree),
      "graft-spec-tmp-cleanup"))

  private[graft] def cleanupOnExit(p: java.nio.file.Path): Unit = {
    hook
    tracked.add(p): Unit
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.path("warehouse"))
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
