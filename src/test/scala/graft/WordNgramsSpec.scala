package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analytics.Dedup

/** Parity of the native [[graft.expressions.WordNgrams]] against the
  * interpreted HOF formulation it replaced — same tokens, order,
  * dedup, and edge behavior. */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  /** The original guarded-HOF shingle formulation. */
  private def hofShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  private val tricky = Seq(
    "a b c d e",
    "a a a a",
    "  leading and trailing  ",
    "\ttab first",          // post-trim leading \t → leading "" token
    "one",
    "",
    "   ",
    "line\nbreak mid text",
    "unicode ü tökens ünd mörè",
    "a  b   c")             // multi-space runs collapse

  test("native shingles match the HOF formulation on tricky inputs") {
    for (n <- Seq(1, 2, 3, 5)) {
      val df = tricky.toDF("s")
      val got = df.select(Dedup.shingles(col("s"), n)).as[Seq[String]]
        .collect()
      val want = df.select(hofShingles(col("s"), n)).as[Seq[String]]
        .collect()
      assert(got.toSeq === want.toSeq, s"n=$n")
    }
  }

  test("native shingles match the HOF formulation on a random sweep") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \t\n  cde  "
    val sweep = Seq.fill(400)(
      (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (n <- Seq(1, 2, 3)) {
      val df = sweep.toDF("s")
      val got = df.select(Dedup.shingles(col("s"), n)).as[Seq[String]]
        .collect()
      val want = df.select(hofShingles(col("s"), n)).as[Seq[String]]
        .collect()
      assert(got.toSeq === want.toSeq, s"n=$n")
    }
  }

  test("null text yields an empty array (explode-compatible)") {
    val got = Seq(Option.empty[String]).toDF("s")
      .select(Dedup.shingles(col("s"), 3)).as[Seq[String]].collect()
    assert(got.head === Seq())
  }

  test("distinct keeps first-occurrence order") {
    val got = Seq("b a b a b").toDF("s")
      .select(Dedup.shingles(col("s"), 2)).as[Seq[String]].collect()
    assert(got.head === Seq("b a", "a b"))
  }

  test("word_ngrams rejects NULL/non-literal parameters at analysis") {
    val nullN = intercept[Exception](
      spark.sql("SELECT word_ngrams('a b', NULL, true)"))
    assert(nullN.getMessage.contains("must not be NULL"))
    val nullD = intercept[Exception](
      spark.sql("SELECT word_ngrams('a b', 2, NULL)"))
    assert(nullD.getMessage.contains("must not be NULL"))
    val nonLit = intercept[Exception](
      Seq(2).toDF("n").select(expr("word_ngrams('a b', n, true)"))
        .collect())
    assert(nonLit.getMessage.contains("must be a literal"))
  }

  test("non-string input is an analysis error, not an executor crash") {
    val err = intercept[Exception](
      Seq(1L).toDF("x").select(Dedup.shingles(col("x"), 2)).collect())
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("word_ngrams is registered as a SQL function") {
    val got = spark.sql(
      "SELECT word_ngrams('x y z', 2, true) AS g")
      .as[Seq[String]].collect()
    assert(got.head === Seq("x y", "y z"))
    val nonDistinct = spark.sql(
      "SELECT word_ngrams('a a a', 2, false) AS g")
      .as[Seq[String]].collect()
    assert(nonDistinct.head === Seq("a a", "a a"))
  }
}
