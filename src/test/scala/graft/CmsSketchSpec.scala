package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Sketches}

/** Count-min sketch: never-undercount guarantee, overcount bound,
  * merge determinism, exactness on sparse input. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimateAll(df: org.apache.spark.sql.DataFrame,
      d: Int, w: Int): Map[String, (Long, Long)] = {
    val sketch = df.agg(
      Sketches.cmsSketch(Dedup.h30($"tok"), d, w).as("__cms"))
    df.groupBy("tok").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(sketch))
      .select($"tok", $"c",
        Sketches.cmsEstimate($"__cms", Dedup.h30($"tok"), d, w)
          .as("est"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("estimates never undercount; sparse input is exact") {
    val df = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(5)("gamma") ++ Seq("delta")).toDF("tok")
    val got = estimateAll(df, 4, 1024)
    got.foreach { case (tok, (exact, est)) =>
      assert(est >= exact, s"$tok undercounted: $est < $exact")
    }
    // 4 distinct keys in 4x1024 counters: collisions virtually
    // impossible -> exact
    assert(got("alpha") == (50L, 50L) && got("delta") == (1L, 1L))
  }

  test("overcount bounded by e/w * N on a crowded sketch") {
    // 2000 distinct keys into w=64: collisions certain, bound must hold
    val n = 2000
    val df = (0 until n).map(i => s"k$i").toDF("tok")
    val got = estimateAll(df, 4, 64)
    val eps = math.E / 64
    got.foreach { case (tok, (exact, est)) =>
      assert(est >= exact)
      assert(est - exact <= (eps * n).ceil.toLong * 4,
        s"$tok overcount ${est - exact} breaks the bound")
    }
  }

  test("partitioning-insensitive: identical sketch array") {
    val df = (0 until 500).map(i => s"t${i % 37}").toDF("tok")
    def sk(d: org.apache.spark.sql.DataFrame) =
      d.agg(Sketches.cmsSketch(Dedup.h30($"tok"), 4, 128).as("s"))
        .collect()(0).getSeq[Long](0)
    assert(sk(df.coalesce(1)) == sk(df.repartition(11)))
  }

  test("sketch counters sum to d * N") {
    val df = (0 until 300).map(i => s"x$i").toDF("tok")
    val arr = df.agg(Sketches.cmsSketch(Dedup.h30($"tok"), 3, 64).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(arr.sum == 3L * 300)
    assert(arr.length == 3 * 64)
  }

  test("inner-product join-size estimate never undercounts") {
    val d = 4
    val w = 256
    val r = (0 until 400).map(i => s"k${i % 40}").toDF("tok") // 10 each
    val s = (0 until 80).map(i => s"k${i % 20}").toDF("tok")  // 4 each
    // exact join size: keys k0..k19 shared -> 20 * 10 * 4 = 800
    val skR = r.agg(Sketches.cmsSketch(Dedup.h30($"tok"), d, w).as("r"))
    val skS = s.agg(Sketches.cmsSketch(Dedup.h30($"tok"), d, w).as("s"))
    val prods = (0 until d).map { i =>
      aggregate(
        slice(zip_with(col("r"), col("s"), (x, y) => x * y), i * w + 1, w),
        lit(0L), (acc, x) => acc + x)
    }
    val est = skR.crossJoin(skS).select(least(prods: _*).as("e"))
      .collect()(0).getLong(0)
    assert(est >= 800L, s"inner product $est undercounts the join")
    assert(est <= 800L + (math.E / w * 400 * 80).ceil.toLong,
      s"inner product $est breaks the error bound")
  }

  test("non-long input fails at analysis with a named error") {
    val e = intercept[Exception] {
      Seq("a").toDF("s").agg(Sketches.cmsSketch($"s", 4, 64)).collect()
    }
    assert(e.getMessage.contains("cms_sketch"))
  }
}
