package graft

import graft.analytics.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: lift ranks a fused pair above independent pairs") {
    // "new york" always co-occurs; "the cat" / "the dog" split "the"'s
    // mass, so their lift is lower
    val docs = Seq.fill(6)("new york is big") ++
      Seq.fill(3)("the cat sat") ++ Seq.fill(3)("the dog sat") ++
      Seq.fill(2)("the end")
    val got = Collocations.collocations(
      docs.toDF("text"), "text", minSupport = 3, topK = 20)
      .select("x", "y", "n", "lift")
      .as[(String, String, Long, Double)].collect()
    val byPair = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(byPair.contains(("new", "york")))
    assert(byPair(("new", "york")) > byPair(("the", "cat")))
    // counts are exact
    assert(got.find(r => (r._1, r._2) == ("new", "york")).get._3 === 6L)
  }

  test("collocations: minSupport drops rare pairs before ranking") {
    val docs = Seq.fill(5)("a b") :+ "x y"
    val got = Collocations.collocations(
      docs.toDF("text"), "text", minSupport = 2, topK = 10)
      .select("x", "y").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b")))
  }

  test("collocations: lift value matches the hand formula") {
    // corpus: "a b" ×4 → N=8 unigrams, B=4 bigrams, c_ab=4, c_a=c_b=4
    // lift = 4·64 / (4·4·4) = 4
    val got = Collocations.collocations(
      Seq.fill(4)("a b").toDF("text"), "text",
      minSupport = 1, topK = 1)
      .select("lift").as[Double].collect()
    assert(got.toSeq === Seq(4.0))
  }

  test("collocations: null and single-token docs contribute no pairs") {
    val docs = Seq(Some("only"), None, Some("a b")).toDF("text")
    val got = Collocations.collocations(docs, "text",
      minSupport = 1, topK = 10)
      .select("x", "y").as[(String, String)].collect().toSet
    assert(got === Set(("a", "b")))
  }
}
