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
}
