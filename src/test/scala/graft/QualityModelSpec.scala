package graft

import org.apache.spark.sql.functions._
import graft.analytics.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("features: exact values on a known document") {
    val d = Seq((1L, "aa bbbb aa cc", "en"),
      (2L, null.asInstanceOf[String], "en")).toDF("doc_id", "text", "lang")
    val r = QualityModel.features(d, "doc_id", "text",
      (col("lang") === "en").cast("int")).collect()
    assert(r.length === 1) // null text dropped
    val f = r(0)
    // 4 tokens: aa bbbb aa cc → distinct 3, lengths 2+4+2+2=10, short 3
    assert(f.getAs[Double]("x1") === math.round(math.log(5.0) * 1e6) / 1e6)
    assert(f.getAs[Double]("x2") === 0.75)
    assert(f.getAs[Double]("x3") === 2.5)
    assert(f.getAs[Double]("x4") === 0.75)
    assert(f.getAs[Double]("y") === 1.0)
  }

  test("train is bit-deterministic under repartitioning") {
    val docs = (0L until 200L).map { i =>
      val words = (0 to (i % 37).toInt).map(j => s"w${(i + j) % 11}")
      (i, words.mkString(" "), if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    def weights(df: org.apache.spark.sql.DataFrame) =
      QualityModel.train(QualityModel.features(df, "doc_id", "text",
        (col("lang") === "en").cast("int")), iters = 3, lr = 0.5).toSeq
    val a = weights(docs)
    val b = weights(docs.repartition(17))
    // exact equality, not approx: integer gradient sums make the
    // reduction order irrelevant — the property the oracle hash needs
    assert(a === b)
    assert(a.exists(_ != 0.0))
  }

  test("train learns a separable signal; score quantized to 1e-4") {
    // label == long documents: x1 alone separates the classes
    val docs = (0L until 120L).map { i =>
      val n = if (i % 2 == 0) 40 else 3
      (i, Seq.fill(n)(s"t${i % 7}").mkString(" "),
        if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val feat = QualityModel.features(docs, "doc_id", "text",
      (col("lang") === "en").cast("int"))
    val w = QualityModel.train(feat, iters = 20, lr = 0.5)
    val scored = QualityModel.score(feat, w).collect()
    val acc = scored.count { r =>
      r.getAs[Long]("pred") == (if (r.getAs[Long]("doc_id") % 2 == 0) 1L
                                else 0L)
    }.toDouble / scored.length
    assert(acc > 0.9, s"separable data should classify: acc=$acc")
    // every score is exactly representable at 4 decimals
    scored.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(math.round(s * 1e4) / 1e4 === s)
    }
  }
}
