package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

class VecSumLongSpec extends SparkSpec {
  import spark.implicits._

  private def vecSum(c: Column, n: Int): Column =
    ColumnBridge.column(
      graft.expressions.VecSumLong(ColumnBridge.expression(c), n)
        .toAggregateExpression())

  test("sums element-wise; null rows skipped") {
    val df = Seq(Some(Seq(1L, 2L)), None, Some(Seq(10L, 20L)))
      .toDF("v")
    val got = df.agg(vecSum(col("v"), 2)).collect()(0)
      .getAs[scala.collection.Seq[Long]](0)
    assert(got.toSeq === Seq(11L, 22L))
  }

  test("wrong-length row throws by name") {
    val df = Seq(Seq(1L, 2L, 3L)).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(vecSum(col("v"), 2)).collect()
    }
    assert(e.getMessage.contains("vec_sum_long") ||
      Option(e.getCause).exists(_.getMessage.contains("vec_sum_long")))
  }

  test("null ELEMENT throws instead of silently summing 0") {
    val df = Seq(Seq(Some(1L), None), Seq(Some(3L), Some(4L)))
      .toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(vecSum(col("v"), 2)).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("null element"))
  }
}
