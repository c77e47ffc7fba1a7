package graft

import graft.analytics.Regression

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def ols(rows: (String, Long, Double)*) =
    Regression.groupOls(
      rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap

  test("groupOls: recovers an exact linear relationship") {
    // y = 2x + 3 exactly -> slope 2, intercept 3, r2 1
    val got = ols(
      ("a", 0L, 3.0), ("a", 1L, 5.0), ("a", 2L, 7.0), ("a", 3L, 9.0))
    val r = got("a")
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 3.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("groupOls: groups are independent") {
    val got = ols(
      ("up", 0L, 1.0), ("up", 1L, 2.0),
      ("down", 0L, 2.0), ("down", 1L, 1.0))
    assert(got("up").getAs[Double]("slope") === 1.0)
    assert(got("down").getAs[Double]("slope") === -1.0)
  }

  test("groupOls: constant x yields null slope, constant y null r2") {
    val got = ols(
      ("cx", 5L, 1.0), ("cx", 5L, 2.0),
      ("cy", 0L, 4.0), ("cy", 1L, 4.0))
    assert(got("cx").isNullAt(got("cx").fieldIndex("slope")))
    assert(got("cy").getAs[Double]("slope") === 0.0)
    assert(got("cy").isNullAt(got("cy").fieldIndex("r2")))
  }

  test("groupOls: null x or y rows are excluded") {
    val df = Seq[(String, Option[Long], Option[Double])](
      ("a", Some(0L), Some(1.0)), ("a", Some(1L), Some(2.0)),
      ("a", None, Some(9.0)), ("a", Some(7L), None))
      .toDF("g", "x", "y")
    val r = Regression.groupOls(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("slope") === 1.0)
  }
}
