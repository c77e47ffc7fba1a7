package graft

import org.apache.spark.sql.functions._
import graft.analytics.LangModel

/** Bigram-LM cross-entropy semantics: hand-computed probabilities on a
  * tiny corpus, short-doc exclusion, and bucket boundary behavior. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams: positioned stream, <2-token and null docs drop out") {
    val docs = Seq(
      (1L, "a b c"), (2L, "solo"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = LangModel.bigrams(docs, "doc_id", "text")
      .orderBy("doc_id", "i")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 1, "a", "b"), (1L, 2, "b", "c")))
  }

  test("cross-entropy matches hand computation with add-alpha smoothing") {
    // corpus: "a b a b" and "a b c" → bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    // contexts: a->3, b->2;  V = 3 (a, b, c)
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val alpha = 0.5
    val v = 3L
    def p(c2: Long, c1: Long): Double =
      (c2 + alpha) / (c1 + alpha * v)
    // doc 1: (a,b) (b,a) (a,b) → logs in position order
    val ce1 = -(math.log(p(3, 3)) + math.log(p(1, 2)) + math.log(p(3, 3))) / 3
    // doc 2: (a,b) (b,c)
    val ce2 = -(math.log(p(3, 3)) + math.log(p(1, 2))) / 2
    val got = LangModel.bigramCrossEntropy(docs, "doc_id", "text", alpha)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == 2)
    assert(got(0)._1 == 1L && got(1)._1 == 2L)
    assert(math.abs(got(0)._2 - ce1) < 1e-12)
    assert(math.abs(got(1)._2 - ce2) < 1e-12)
    assert(got(0)._3 == 3L && got(1)._3 == 2L)
  }

  test("knTrigram: all-singleton corpus matches hand computation") {
    // docs "a b c" and "d e f": every trigram/count is 1, bigram types
    // B = {(a,b),(b,c),(d,e),(e,f)} = 4, every continuation count 1
    // P = (1−D)/1 + D·1/1 · ((1−D)/1 + D·1/1 · (1/4)), D = 0.75
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val p = 0.25 + 0.75 * (0.25 + 0.75 * 0.25)
    val exp = -math.log(p)
    val got = LangModel.knTrigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == 2)
    assert(got.forall(g => math.abs(g._2 - exp) < 1e-12))
    assert(got.forall(_._3 == 1L))
  }

  test("knTrigram: repeated trigram raises probability via c3 and D") {
    // three copies of "a b c": c3 = 3, c(ab·) = 3, N1+(ab·) = 1,
    // N1+(·bc) = 1, N1+(·b·) = 1, N1+(b·) = 1, B = 2, N1+(·c) = 1
    // P = (3−D)/3 + (D·1/3)·((1−D)/1 + (D·1/1)·(1/2))
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val d = 0.75
    val p = (3 - d) / 3 + (d * 1 / 3) * ((1 - d) / 1 + (d * 1 / 1) * 0.5)
    val exp = -math.log(p)
    val got = LangModel.knTrigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == 3)
    assert(got.forall(g => math.abs(g._2 - exp) < 1e-12))
  }

  test("knTrigram: docs with fewer than three tokens drop out") {
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = LangModel.knTrigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("ceBucket: strict head, inclusive middle at both boundaries") {
    val rows = Seq(0.9, 1.0, 1.5, 2.0, 2.1).toDF("ce4")
    val got = rows
      .select(LangModel.ceBucket(col("ce4"), 1.0, 2.0).as("b"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("head", "middle", "middle", "middle", "tail"))
  }
}
