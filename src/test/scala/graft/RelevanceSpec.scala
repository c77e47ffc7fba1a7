package graft

import graft.analytics.Relevance

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Int, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rn")

  test("rrfFuse: doc in both runs beats single-run docs at same depth") {
    val lex = run((1, 10L, 1), (1, 11L, 2))
    val dense = run((1, 10L, 2), (1, 12L, 1))
    val got = Relevance.rrfFuse(lex, dense, k = 60, topK = 10)
      .as[(Int, Long, Double, Int)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    // doc 10: 1/61 + 1/62; doc 12: 1/61; doc 11: 1/62
    assert(got(10L)._1 === 1.0 / 61 + 1.0 / 62)
    assert(got(10L)._2 === 1)
    assert(got(12L)._1 === 1.0 / 61)
    assert(got(12L)._2 === 2)
    assert(got(11L)._2 === 3)
  }

  test("rrfFuse: queries fuse independently; topK bounds output") {
    val lex = run((1, 10L, 1), (2, 20L, 1), (2, 21L, 2))
    val dense = run((2, 22L, 1))
    val got = Relevance.rrfFuse(lex, dense, k = 60, topK = 2)
      .orderBy("query_id", "rn")
      .as[(Int, Long, Double, Int)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ===
      Seq((1, 10L), (2, 20L), (2, 22L)))
  }

  test("rrfFuse: rrf ties break by doc_id") {
    val lex = run((1, 5L, 1), (1, 3L, 2))
    val dense = run((1, 9L, 1), (1, 7L, 2))
    val got = Relevance.rrfFuse(lex, dense, k = 60, topK = 4)
      .orderBy("rn").as[(Int, Long, Double, Int)].collect().toSeq
    // ranks 1 tie between docs 5 and 9 -> doc_id order
    assert(got.map(_._2) === Seq(5L, 9L, 3L, 7L))
  }
}
