package graft

import graft.analytics.Evaluation
import org.apache.spark.sql.functions.col

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def eval(rows: Seq[(Double, Int)], buckets: Int = 64) =
    Evaluation.scoreEval(
      rows.toDF("score", "label"), "score", "label", buckets)
      .collect()(0)

  test("scoreEval: perfect separation gives AUC 1, KS 1") {
    val r = eval(Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)))
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Double]("gini") === 1.0)
    assert(r.getAs[Double]("ks") === 1.0)
  }

  test("scoreEval: reversed scores give AUC 0") {
    val r = eval(Seq((0.9, 0), (0.8, 0), (0.1, 1), (0.2, 1)))
    assert(r.getAs[Double]("auc") === 0.0)
    assert(r.getAs[Double]("gini") === -1.0)
  }

  test("scoreEval: ties take average ranks") {
    // scores: 0.5(pos), 0.5(neg) tie -> both rank 1.5; 0.7(pos) rank 3
    // rank-sum of positives = 1.5 + 3 = 4.5
    // AUC = (4.5 - 2*3/2) / (2*1) = 1.5/2 = 0.75
    val r = eval(Seq((0.5, 1), (0.5, 0), (0.7, 1)))
    assert(r.getAs[Double]("auc") === 0.75)
  }

  test("scoreEval: bucket count does not change the result") {
    val rows = (1 to 200).map(i => (math.sin(i).abs, i % 3 min 1))
    val a = eval(rows, buckets = 1)
    val b = eval(rows, buckets = 7)
    val c = eval(rows, buckets = 64)
    for (f <- Seq("auc", "ks")) {
      assert(a.getAs[Double](f) === b.getAs[Double](f))
      assert(b.getAs[Double](f) === c.getAs[Double](f))
    }
  }

  test("scoreEval: single class and empty input degrade to nulls") {
    val one = eval(Seq((0.3, 1), (0.9, 1)))
    assert(one.getAs[Long]("n_neg") === 0L)
    assert(one.isNullAt(one.fieldIndex("auc")))
    val empty = eval(Seq.empty[(Double, Int)])
    assert(empty.getAs[Long]("n") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("ks")))
  }

  test("calibrationBins: hand-computed bins and ECE") {
    import spark.implicits._
    // scale 100: si = 5, 15, 15, 95 → bins 0, 1, 1, 9
    val scored = Seq((0.05, 0L), (0.15, 0L), (0.15, 1L), (0.95, 1L))
      .toDF("score", "y")
    val rows = graft.analytics.Evaluation.calibrationBins(
        scored, col("score"), col("y"), nBins = 10, scale = 100L)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 9L))
    val byBin = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byBin(0L) === ((1L, 0.05, 0.0)))
    assert(byBin(1L) === ((2L, 0.15, 0.5)))
    assert(byBin(9L) === ((1L, 0.95, 1.0)))
    // ECE = (|0·100−5| + |1·100−30| + |1·100−95|) / (100·4) = 0.2
    rows.foreach(r => assert(r.getDouble(4) === 0.2))
  }

  test("calibrationBins: score 1.0 lands in the top bin; nulls drop") {
    import spark.implicits._
    val scored = Seq((Some(1.0), Some(1L)), (Some(0.0), Some(0L)),
      (None, Some(1L)), (Some(0.5), None))
      .toDF("score", "y")
    val rows = graft.analytics.Evaluation.calibrationBins(
        scored, col("score"), col("y"), nBins = 10, scale = 100L)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 9L))
    assert(rows.map(_.getLong(1)).sum === 2L)
    // both bins perfectly calibrated → ECE 0
    rows.foreach(r => assert(r.getDouble(4) === 0.0))
  }

  test("welchTTest: hand-computed equal-variance case") {
    // arm 0: 100, 200, 300 cents (mean 2.0, var 1.0)
    // arm 1: 400, 500, 600 cents (mean 5.0, var 1.0)
    // se2 = 1/3+1/3; t = -3/sqrt(2/3); welch df = 4
    val df = Seq((0, 100L), (0, 200L), (0, 300L),
      (1, 400L), (1, 500L), (1, 600L)).toDF("v", "yc")
    val r = graft.analytics.Evaluation.welchTTest(df, "v", "yc")
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 5.0)
    assert(r.getAs[Double]("var_a") === 1.0)
    assert(math.abs(r.getAs[Double]("t_stat")
      - (-3.0 / math.sqrt(2.0 / 3.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("welch_df") - 4.0) < 1e-12)
  }

  test("welchTTest: an arm below n=2 yields null t and df") {
    val df = Seq((0, 100L), (1, 400L), (1, 500L)).toDF("v", "yc")
    val r = graft.analytics.Evaluation.welchTTest(df, "v", "yc")
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 1L)
    assert(r.isNullAt(r.fieldIndex("var_a")))
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    assert(r.isNullAt(r.fieldIndex("welch_df")))
  }

  test("welchTTest: zero variance in both arms yields null t") {
    val df = Seq((0, 100L), (0, 100L), (1, 200L), (1, 200L))
      .toDF("v", "yc")
    val r = graft.analytics.Evaluation.welchTTest(df, "v", "yc")
      .collect()(0)
    assert(r.getAs[Double]("var_a") === 0.0)
    assert(r.isNullAt(r.fieldIndex("t_stat")))
  }

  test("scoreEval: null scores and labels are excluded") {
    val df = Seq[(Option[Double], Option[Int])](
      (Some(0.1), Some(0)), (Some(0.9), Some(1)),
      (None, Some(1)), (Some(0.5), None))
      .toDF("score", "label")
    val r = Evaluation.scoreEval(df, "score", "label").collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("auc") === 1.0)
  }

  private def drift(rows: Seq[(String, Double)]) =
    Evaluation.distributionDrift(
      rows.toDF("g", "v"), "g", "v")
      .select("g", "n_a", "n_b", "ks", "w1")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("distributionDrift: disjoint supports give KS 1 and exact W1") {
    // A = {1, 2}, B = {3, 4}: KS = 1, W1 = |mean shift| = 2.0
    val got = drift(Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)))
    assert(got("a") === ((2L, 2L, 1.0, 2.0)))
    assert(got("b") === ((2L, 2L, 1.0, 2.0)))
  }

  test("distributionDrift: identical distributions give zero drift") {
    val got = drift(Seq(("a", 1.5), ("a", 7.25), ("b", 1.5),
      ("b", 7.25)))
    assert(got("a") === ((2L, 2L, 0.0, 0.0)))
  }

  test("distributionDrift: unit shift gives W1 = 1 and KS = 1/3") {
    // A = {1,2,3}, B = {2,3,4}: F differs by 1/3 on [1,2)∪[3,4)
    val got = drift(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)))
    val (na, nb, ks, w1) = got("a")
    assert((na, nb) === ((3L, 3L)))
    assert(ks === 3.0 / 9.0)
    assert(w1 === 1.0)
  }

  test("distributionDrift: result is partitioning-invariant") {
    val rows = (1 to 300).map(i =>
      (if (i % 3 == 0) "a" else "b", (i % 17) * 0.25 + i % 7))
    val base = Evaluation.distributionDrift(
      rows.toDF("g", "v"), "g", "v")
      .collect().map(_.toSeq).toSeq
    val shuffled = Evaluation.distributionDrift(
      rows.toDF("g", "v").repartition(13), "g", "v")
      .collect().map(_.toSeq).toSeq
    assert(base === shuffled)
  }

  private def jsd(rows: Seq[(String, String)]) =
    Evaluation.tokenJsDrift(rows.toDF("g", "text"), "g", "text")
      .select("g", "n_tokens", "n_rest", "vocab", "jsd")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("tokenJsDrift: identical token distributions give zero") {
    val got = jsd(Seq(("a", "x x y"), ("b", "x x y")))
    val (na, nb, vocab, d) = got("a")
    assert((na, nb, vocab) === ((3L, 3L, 2L)))
    assert(d === 0.0)
  }

  test("tokenJsDrift: disjoint vocabularies give ln 2") {
    val got = jsd(Seq(("a", "u u"), ("b", "v")))
    assert(math.abs(got("a")._4 - math.log(2.0)) < 1e-9)
    assert(math.abs(got("b")._4 - math.log(2.0)) < 1e-9)
  }

  test("tokenJsDrift: hand-computed two-token mixture") {
    // a: {x: 2/3, y: 1/3}; rest(=b): {x: 1/4, y: 3/4}
    val got = jsd(Seq(("a", "x x y"), ("b", "x y y y")))
    val expect = 0.5 * (
      2.0 / 3 * math.log((4.0 / 3) / (2.0 / 3 + 0.25)) +
        0.25 * math.log(0.5 / (2.0 / 3 + 0.25)) +
        1.0 / 3 * math.log((2.0 / 3) / (1.0 / 3 + 0.75)) +
        0.75 * math.log(1.5 / (1.0 / 3 + 0.75)))
    assert(math.abs(got("a")._4 - expect) < 1e-9)
    assert((got("a")._1, got("a")._2, got("a")._3) === ((3L, 4L, 2L)))
    // symmetric by construction for two groups
    assert(math.abs(got("b")._4 - expect) < 1e-9)
  }

  test("tokenJsDrift: result is partitioning-invariant") {
    val rows = (1 to 200).map(i =>
      (if (i % 3 == 0) "a" else "b",
        s"tok${i % 11} tok${i % 7} tok${(i * 13) % 17}"))
    val base = Evaluation.tokenJsDrift(
      rows.toDF("g", "text"), "g", "text").collect().map(_.toSeq).toSeq
    val shuf = Evaluation.tokenJsDrift(
      rows.toDF("g", "text").repartition(13), "g", "text")
      .collect().map(_.toSeq).toSeq
    assert(base === shuf)
  }

  test("twoProportionZ: hand-computed pooled z and degenerate nulls") {
    def run(rows: Seq[(Boolean, Boolean)]) =
      Evaluation.twoProportionZ(rows.toDF("a", "c"),
        col("a"), col("c")).collect()(0)
    // arm A: 8 of 10 convert; arm B: 2 of 10
    val rows = Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(8)((false, false))
    val r = run(rows)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 8L, 10L, 2L)))
    val pp = 0.5
    val want = (0.8 - 0.2) / math.sqrt(pp * 0.5 * (0.1 + 0.1))
    assert(math.abs(r.getDouble(6) - want) < 1e-12)
    // everyone converts -> pooled rate 1 -> z null
    assert(run(Seq((true, true), (false, true))).isNullAt(6))
  }

  test("mannWhitneyU: closed forms for clean separation and " +
      "identical distributions, midrank tie handling") {
    def run(rows: Seq[(String, Double)]) =
      Evaluation.mannWhitneyU(rows.toDF("g", "v"), "g", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // a = {1,2,3}, b = {10,20,30}: every a below every b -> U_a = 0
    val sep = run(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)))
    assert(sep("a")._3 === 0L)           // u2 = 2U = 0
    assert(sep("b")._3 === 2L * 9L)      // U_b = 9
    assert(sep("a")._4.get < 0 && sep("b")._4.get > 0)
    // identical distributions: U = na*nb/2 exactly -> z = 0
    val same = run(Seq(("a", 5.0), ("a", 7.0),
      ("b", 5.0), ("b", 7.0)))
    assert(same("a")._3 === 2L * 2L)     // U = na*nb/2 = 2
    assert(same("a")._4.get === 0.0)
    // all-tied block: midranks keep U at the null mean
    val tied = run(Seq(("a", 4.0), ("a", 4.0), ("b", 4.0)))
    assert(tied("a")._3 === 2L * 1L)     // U = na*nb/2 = 1
    // variance collapses to 0 under a single tied block -> z null
    assert(tied("a")._4 === None)
  }

  test("groupEntropy: uniform mix gives ln k, single label gives 0") {
    val rows = (0 until 40).map(i => (i % 2, s"s${i % 4}")) ++
      Seq.fill(10)((2, "only"))
    val got = Evaluation.groupEntropy(rows.toDF("g", "lab"),
        "g", "lab")
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // groups 0/1: 20 rows uniformly over 4 sources (g=0 sees s0,s2;
    // wait: i%2 and i%4 correlate — i even -> s0/s2, i odd -> s1/s3:
    // each group has 2 labels uniformly -> ln 2
    assert(got(0)._1 === 20L && got(0)._2 === 2L)
    assert(math.abs(got(0)._3 - math.log(2.0)) < 1e-9)
    assert(math.abs(got(1)._3 - math.log(2.0)) < 1e-9)
    assert(got(2) === ((10L, 1L, 0.0)))
  }

  test("groupEntropy is partitioning-invariant") {
    val rows = (1 to 300).map(i => (i % 5, s"lab${(i * 7) % 11}"))
    val a = Evaluation.groupEntropy(rows.toDF("g", "lab"), "g", "lab")
      .collect().map(_.toSeq).toSeq
    val b = Evaluation.groupEntropy(
        rows.reverse.toDF("g", "lab").repartition(13), "g", "lab")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("cohenKappa: perfect agreement 1, symmetric disagreement " +
      "lands at its closed form, constant rater null") {
    def kappa(rows: Seq[(Boolean, Boolean)]): Option[Double] = {
      val r = Evaluation.cohenKappa(rows.toDF("a", "b"),
        col("a"), col("b")).collect()(0)
      Option(r.get(5)).map(_.asInstanceOf[Double])
    }
    assert(kappa(Seq((true, true), (false, false), (true, true)))
      === Some(1.0))
    // 2x2 balanced: a=b half the time -> po=0.5, pe=0.5 -> k=0
    assert(kappa(Seq((true, true), (true, false), (false, true),
      (false, false))) === Some(0.0))
    // one constant rater still has a defined kappa (0: observed
    // agreement equals chance); BOTH constant degenerates to null
    assert(kappa(Seq((true, true), (true, false))) === Some(0.0))
    assert(kappa(Seq((true, true), (true, true))) === None)
    // hand-computed: n=10, both_pos=4, both_neg=3, only_a=2, only_b=1
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(3)((false, false)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(1)((false, true))
    val e = (6.0 * 5 + 4.0 * 5) / 100
    val want = (0.7 - e) / (1 - e)
    assert(math.abs(kappa(rows).get - want) < 1e-12)
  }

  test("distributionDrift: null groups and values are excluded") {
    val df = Seq[(Option[String], Option[Double])](
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("b"), Some(3.0)), (Some("b"), Some(4.0)),
      (None, Some(9.0)), (Some("a"), None))
      .toDF("g", "v")
    val r = Evaluation.distributionDrift(df, "g", "v")
      .select("g", "n_a", "n_b").as[(String, Long, Long)]
      .collect().map { case (g, a, b) => g -> ((a, b)) }.toMap
    assert(r === Map("a" -> ((2L, 2L)), "b" -> ((2L, 2L))))
  }

  test("classificationReport: hand-computed multi-class P/R/F1, " +
      "one-sided classes get rows") {
    import spark.implicits._
    // truth/pred: en->en x3, en->fr, fr->fr, zh->en (zh never
    // predicted; 'de' never true or predicted -> absent)
    val df = Seq(
      ("en", "en"), ("en", "en"), ("en", "en"), ("en", "fr"),
      ("fr", "fr"), ("zh", "en"), (null, "en"), ("en", null))
      .toDF("t", "p")
    val got = Evaluation.classificationReport(df, col("t"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("en", "fr", "zh"))
    val en = got("en")
    assert(en.getAs[Long]("n_true") === 4L)
    assert(en.getAs[Long]("n_pred") === 4L)
    assert(en.getAs[Long]("tp") === 3L)
    assert(en.getAs[Double]("precision") === 0.75)
    assert(en.getAs[Double]("recall") === 0.75)
    assert(en.getAs[Double]("f1") === 6.0 / 8.0)
    val fr = got("fr")
    assert(fr.getAs[Long]("n_true") === 1L &&
      fr.getAs[Long]("n_pred") === 2L && fr.getAs[Long]("tp") === 1L)
    assert(fr.getAs[Double]("f1") === 2.0 / 3.0)
    val zh = got("zh")
    assert(zh.getAs[Long]("n_pred") === 0L)
    assert(zh.isNullAt(zh.fieldIndex("precision")))
    assert(zh.getAs[Double]("recall") === 0.0)
    // micro accuracy: 4 correct of 6 scored rows (nulls excluded)
    assert(en.getAs[Double]("accuracy") === 4.0 / 6.0)
  }
}
