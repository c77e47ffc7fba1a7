package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.{Dedup, Sampling}
import graft.warehouse.Writer

/** Property-style invariants for the round-15 pipeline operators —
  * randomized corpora instead of the hand-computed cases in
  * PipelineOpsSpec/WriterSpec. Uses raw scalacheck generators with a
  * FIXED seed sequence (the scalatest bridge isn't on the offline
  * classpath, and seeded samples make failures reproducible anyway);
  * Spark jobs are expensive per example, so each property checks a
  * handful of generated corpora. */
class PipelinePropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val corpusGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
  } yield toks.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  test("tokenBalancedShards: matches the naive global prefix replay") {
    val cases = samples(for {
      rows <- corpusGen
      st <- Gen.choose(1L, 60L)
      b <- Gen.choose(1, 6)
    } yield (rows, st, b), 5)
    assert(cases.nonEmpty)
    for ((rows, shardTokens, buckets) <- cases) {
      val df = rows.toDF("doc_id", "toks")
      val got = Writer.tokenBalancedShards(df, "doc_id", "toks",
          shardTokens, buckets)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      def h30(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes).take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(d, 16) % Dedup.P
      }
      def md5(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
      val byId = rows.toMap
      val ordered = rows.map(_._1).sortBy(i =>
        (h30(i.toString) % buckets, md5(i.toString), i))
      var pre = 0L
      val want = ordered.map { i =>
        val s = pre / shardTokens; pre += byId(i); i -> s
      }.toMap
      assert(got === want, s"st=$shardTokens b=$buckets rows=$rows")
    }
  }

  test("mixtureSelect: subset, budget respected, whitelist enforced") {
    val cases = samples(for {
      rows <- corpusGen
      nG <- Gen.choose(1, 4)
      budget <- Gen.choose(0L, 200L)
    } yield (rows.map { case (id, t) =>
      (id, s"g${id % (nG + 1)}", id % 7, t) }, nG, budget), 5)
    assert(cases.nonEmpty)
    for ((rows, nG, budget) <- cases) {
      val df = rows.toDF("doc_id", "g", "score", "toks")
      // leave at least one group (g<nG>) out of the whitelist
      val budgets = (0 until nG).map(i => s"g$i" -> budget).toMap
      val sel = Sampling.mixtureSelect(df, "doc_id", "g", "score",
          "toks", budgets)
        .select("doc_id", "g", "toks").as[(Long, String, Long)]
        .collect().toSeq
      assert(sel.forall(r => budgets.contains(r._2)),
        "selected doc from an unlisted group")
      val ids = sel.map(_._1)
      assert(ids.distinct.size === ids.size)
      assert(ids.toSet.subsetOf(rows.map(_._1).toSet))
      sel.groupBy(_._2).foreach { case (g, rs) =>
        assert(rs.map(_._3).sum <= budgets(g), s"group $g over budget")
      }
    }
  }

  test("autoSignBits: monotone in n, bucket bound holds") {
    val cases = samples(for {
      n <- Gen.choose(1L, 1000000000L)
      t <- Gen.choose(1, 1024)
    } yield (n, t), 200)
    assert(cases.nonEmpty)
    for ((n, target) <- cases) {
      val b = Dedup.autoSignBits(n, target)
      assert(b >= 1 && b <= 24)
      assert(b === 24 || n.toDouble / (1L << b) <= target.toDouble,
        s"n=$n target=$target bits=$b")
      assert(Dedup.autoSignBits(n * 2, target) >= b)
    }
  }
}
