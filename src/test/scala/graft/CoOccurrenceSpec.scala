package graft

import graft.analytics.CoOccurrence

class CoOccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def baskets(rows: (Long, Long)*) =
    rows.toDF("bk", "it")

  test("itemPairs: jaccard from exact basket-set counts") {
    // items 1,2 share baskets {10,11}; item 1 also in 12, item 3 in 12
    val df = baskets((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L))
    val got = CoOccurrence.itemPairs(df, "bk", "it",
      minSupport = 1, topK = 10)
      .select("item_a", "item_b", "n_ab", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // (1,2): n_ab=2, n_1=3, n_2=2 -> 2/(3+2-2) = 2/3
    assert(got((1L, 2L)) === ((2L, 2.0 / 3.0)))
    // (1,3): 1/(3+1-1) = 1/3
    assert(got((1L, 3L)) === ((1L, 1.0 / 3.0)))
    // 2 and 3 never co-occur
    assert(!got.contains((2L, 3L)))
  }

  test("itemPairs: duplicate basket lines collapse before counting") {
    val df = baskets((10L, 1L), (10L, 1L), (10L, 2L))
    val got = CoOccurrence.itemPairs(df, "bk", "it",
      minSupport = 1, topK = 10)
      .select("n_ab", "n_a", "n_b").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq((1L, 1L, 1L)))
  }

  test("itemPairs: minSupport prunes and maxBasket drops giants") {
    val giant = (1L to 50L).map(i => (99L, i))
    val df = baskets((giant :+ ((10L, 1L)) :+ ((10L, 2L)) :+
      ((11L, 1L)) :+ ((11L, 2L))): _*)
    val capped = CoOccurrence.itemPairs(df, "bk", "it",
      minSupport = 2, topK = 100, maxBasket = Some(10))
      .select("item_a", "item_b").as[(Long, Long)].collect().toSet
    // the 50-item basket is dropped entirely; only (1,2) survives
    assert(capped === Set((1L, 2L)))
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets: {A,B}, {A,B}, {A,C}, {B}  (A=1, B=2, C=3)
    val df = baskets((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 2L))
    val got = CoOccurrence.associationRules(df, "bk", "it",
      minSupport = 2, topK = 10)
      .select("antecedent", "consequent", "n_ab", "support",
        "confidence", "lift")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // A→B: n_ab=2, n_baskets=4, n_A=3, n_B=3
    assert(got((1L, 2L)) ===
      ((2L, 0.5, 2.0 / 3.0, 2.0 * 4.0 / (3.0 * 3.0))))
    // B→A is the mirrored direction with its own confidence
    assert(got((2L, 1L)) ===
      ((2L, 0.5, 2.0 / 3.0, 2.0 * 4.0 / (3.0 * 3.0))))
    // A→C co-occurs once: below minSupport=2
    assert(!got.contains((1L, 3L)) && !got.contains((3L, 1L)))
  }

  test("associationRules: lift above/below 1 separates real affinity") {
    // C appears in every basket (no information, lift 1); D pairs
    // only with E (lift > 1 both ways).
    val rows =
      (1L to 4L).map(b => (b, 30L)) ++
        Seq((1L, 40L), (1L, 50L), (2L, 40L), (2L, 50L))
    val got = CoOccurrence.associationRules(rows.toDF("bk", "it"),
      "bk", "it", minSupport = 2, topK = 100)
      .select("antecedent", "consequent", "lift")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((40L, 30L)) === 1.0) // consequent at base rate
    assert(got((40L, 50L)) === 2.0) // 2·4/(2·2)
    assert(got((50L, 40L)) === 2.0)
  }

  test("associationRules: topK cut is a deterministic total order") {
    val df = baskets((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L), (13L, 2L), (13L, 3L))
    // both rules tie on lift; the (antecedent, consequent) tiebreak
    // makes the single kept row well-defined
    val got = CoOccurrence.associationRules(df, "bk", "it",
      minSupport = 2, topK = 1)
      .select("antecedent", "consequent").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("frequentTriples: Apriori prune and hand-computed support") {
    import graft.analytics.CoOccurrence
    // baskets: {1,2,3} x2, {1,2,4}, {2,3,4}: pairs with sup>=2:
    // (1,2)x3, (1,3)x2, (2,3)x3, (2,4)x2, (3,4)? only 1 -> out.
    // candidate triples from frequent pairs with all sub-pairs
    // frequent: (1,2,3) only — (1,2,4) needs (1,4) [sup 1, out],
    // (2,3,4) needs (3,4) [out]. Support of (1,2,3) = 2.
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L),
      (13L, 2L), (13L, 3L), (13L, 4L)).toDF("bk", "it")
    val got = CoOccurrence.frequentTriples(rows, "bk", "it",
        minSupport = 2L, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 3L, 2L, 0.5)))
  }

  test("associationRules: maxBasket drops the giant basket AND its " +
      "baskets leave the support denominator") {
    // giant basket 99 holds 50 items; baskets 10/11 hold {1,2}.
    val giant = (1L to 50L).map(i => (99L, i))
    val df = baskets((giant :+ ((10L, 1L)) :+ ((10L, 2L)) :+
      ((11L, 1L)) :+ ((11L, 2L))): _*)
    val got = CoOccurrence.associationRules(df, "bk", "it",
      minSupport = 2, topK = 100, maxBasket = Some(10))
      .select("antecedent", "consequent", "n_ab", "support")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // only the two small baskets survive -> n_baskets = 2, not 3
    assert(got === Map((1L, 2L) -> ((2L, 1.0)),
      (2L, 1L) -> ((2L, 1.0))))
  }

  test("frequentTriples: maxBasket guards the level-2 self-join") {
    // triple {1,2,3} appears in two small baskets; the 40-item giant
    // contains it too but is dropped before pair generation, so
    // support counts only the capped population (2 of 2 baskets).
    val giant = (1L to 40L).map(i => (99L, i))
    val rows = (giant ++ Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L))).toDF("bk", "it")
    val got = CoOccurrence.frequentTriples(rows, "bk", "it",
        minSupport = 2L, topK = 10, maxBasket = Some(10))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 3L, 2L, 1.0)))
  }

  test("userSimilarity: cosine from shared capped items, ubiquitous " +
      "item dropped before degrees") {
    import graft.analytics.CoOccurrence
    // item 99 is in EVERY basket (df 4 > cap 3) -> dropped first.
    // capped: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {c}
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "99"),
      (2L, "a"), (2L, "b"), (2L, "99"),
      (3L, "a"), (3L, "99"),
      (4L, "c"), (4L, "99")).toDF("u", "it")
    val got = CoOccurrence.userSimilarity(rows, "u", "it",
        maxItemDf = 3L, topK = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val bp = got.map(r => (r._1, r._2) -> r).toMap
    assert(bp((1L, 2L))._3 === 2L)                 // share a, b
    assert(bp((1L, 2L))._6 === 1.0)                // identical sets
    assert(math.abs(bp((1L, 3L))._6 - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(!bp.contains((1L, 4L)))                 // only shared 99
    assert(got.head._6 === 1.0)
  }
}
