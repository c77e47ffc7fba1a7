package graft

import org.apache.spark.sql.functions._
import graft.analytics.Similarity

/** Bit-identity of the split cosine form — `cosinePre(dot(a,b),
  * embNorm(a), embNorm(b))` — against the one-pass [[CosineSim]]
  * kernel, over the input shapes the pair scorers feed it: float and
  * double arrays, negatives, zero vectors, empty arrays, null
  * elements, null arrays, mismatched lengths. The r19 norm-precompute
  * rewrite (norms per ROW before the pair join instead of per PAIR
  * inside the kernel) rests on this equivalence: identical IEEE folds
  * per array, correctly-rounded sqrt, commutative multiply — so the
  * assertion is EXACT double equality (bit pattern via
  * doubleToRawLongBits), not a tolerance.
  */
class DotProductSpec extends SparkSpec {

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null
    else java.lang.Long.valueOf(
      java.lang.Double.doubleToRawLongBits(d.doubleValue()))

  test("cosinePre(dot, embNorm, embNorm) is bit-identical to cosine " +
      "on float arrays, including zero/empty/null/mismatch shapes") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])] =
      (0L until 200L).map { i =>
        def vec(n: Int): Seq[java.lang.Float] =
          Seq.fill(n)(java.lang.Float.valueOf(
            (rnd.nextFloat() - 0.5f) * 4.0f))
        i match {
          case 0 => (i, Seq.empty, Seq.empty)                // 0/0 = NaN
          case 1 => (i, vec(8), vec(5))                      // mismatch
          case 2 => (i, Seq.fill(8)(java.lang.Float.valueOf(0f)),
            vec(8))                                          // zero vec
          case 3 => (i, vec(8).updated(3, null), vec(8))     // null elem
          case 4 => (i, null, vec(8))                        // null array
          case _ => (i, vec(16), vec(16))
        }
      }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
    val both = df
      .withColumn("one_pass", Similarity.cosine(col("a"), col("b")))
      .withColumn("split", Similarity.cosinePre(
        Similarity.dot(col("a"), col("b")),
        Similarity.embNorm(col("a")), Similarity.embNorm(col("b"))))
      .select("id", "one_pass", "split")
      .collect()
    assert(both.length === 200)
    for (r <- both) {
      val one = if (r.isNullAt(1)) null
        else java.lang.Double.valueOf(r.getDouble(1))
      val two = if (r.isNullAt(2)) null
        else java.lang.Double.valueOf(r.getDouble(2))
      assert(bits(one) === bits(two),
        s"row ${r.getLong(0)}: one-pass $one vs split $two")
    }
    // shape sanity: the engineered rows exercise the null/NaN paths
    val byId = both.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null
       else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(byId(0L) != null && byId(0L).isNaN, "empty/empty is NaN")
    assert(byId(1L) == null, "length mismatch is null")
    assert(byId(2L) != null && byId(2L).isNaN, "zero vector is NaN")
    assert(byId(3L) == null, "null element is null")
    assert(byId(4L) == null, "null array is null")
  }

  test("split form matches on double arrays too") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 64L).map { i =>
      (i, Seq.fill(12)(rnd.nextDouble() - 0.5),
        Seq.fill(12)(rnd.nextDouble() - 0.5))
    }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
    val bad = df
      .withColumn("one_pass", Similarity.cosine(col("a"), col("b")))
      .withColumn("split", Similarity.cosinePre(
        Similarity.dot(col("a"), col("b")),
        Similarity.embNorm(col("a")), Similarity.embNorm(col("b"))))
      .filter(col("one_pass") =!= col("split"))
      .count()
    assert(bad === 0L)
  }
}
