package graft

import org.apache.spark.sql.functions._
import graft.analytics.{CorpusOps, Dedup, Sampling}

/** Hand-computed semantics for the round-15 pipeline operators:
  * mixture-weighted selection, chunk-level decontamination,
  * quality-aware dedup apply, and the dedup-aware split. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureSelect: per-group budgets, whitelist drops others") {
    // groupA: docs of 10 tokens each, scores 3 > 2 > 1; budget 25
    // keeps both score-3 and score-2 fully (20) and NO score-1 doc
    // (cum 30 > 25). groupB budget 10 keeps exactly its best doc.
    // groupC is not in the mixture -> dropped entirely.
    val docs = Seq(
      (1L, "A", 3L, 10L), (2L, "A", 2L, 10L), (3L, "A", 1L, 10L),
      (4L, "B", 9L, 10L), (5L, "B", 8L, 10L),
      (6L, "C", 99L, 1L))
      .toDF("doc_id", "g", "score", "toks")
    val got = Sampling.mixtureSelect(docs, "doc_id", "g", "score",
        "toks", Map("A" -> 25L, "B" -> 10L))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L))
  }

  test("mixtureSelect: boundary score takes partial docs in hash order") {
    // one group, all docs same score, 3-token docs, budget 7 ->
    // exactly two docs fit; which two is the (md5(id), id) prefix
    val docs = (1L to 4L).map(i => (i, "A", 5L, 3L))
      .toDF("doc_id", "g", "score", "toks")
    val got = Sampling.mixtureSelect(docs, "doc_id", "g", "score",
        "toks", Map("A" -> 7L))
      .select("doc_id").as[Long].collect().toSet
    val order = (1L to 4L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
    assert(got === order.take(2).toSet)
  }

  test("decontaminateChunks: contaminated chunk dropped, short chunk kept") {
    // window=3, n=2. bench holds the bigram "x y".
    // doc 1: tokens [a b c | x y d | e] -> chunk 0 clean (3 tokens),
    //   chunk 1 contains "x y" -> dropped, chunk 2 has 1 token (< n,
    //   no bigram) -> kept. n_chunks=3, kept=2, dropped=1, kept_tokens=4.
    // doc 2: [p q] one clean chunk of 2.
    val corpus = Seq((1L, "a b c x y d e"), (2L, "p q"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "x y")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminateChunks(corpus, bench,
        "doc_id", "text", window = 3, n = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "n_dropped", "kept_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 2L, 1L, 4L), (2L, 1L, 1L, 0L, 2L)))
  }

  test("decontaminateChunks: shingle must sit INSIDE one chunk") {
    // "x y" straddles the chunk boundary (window=2: [a x | y b]) ->
    // no chunk contains the bigram, nothing is dropped
    val corpus = Seq((1L, "a x y b")).toDF("doc_id", "text")
    val bench = Seq((100L, "x y")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminateChunks(corpus, bench,
        "doc_id", "text", window = 2, n = 2)
      .select("n_dropped").as[Long].collect()
    assert(got.toSeq === Seq(0L))
  }

  test("keepBestRepresentatives: survivor is argmax score, tie min id") {
    // cluster {1,2,3}: scores 5, 9, 9 -> keep 2 (9 ties broken by id);
    // singleton 4 keeps itself
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.keepBestRepresentatives(docs, "doc_id", "score",
        pairs).orderBy("doc_id")
      .select("doc_id", "n_members").as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 3L), (4L, 1L)))
  }

  test("clusterSplit: one side per cluster, rule matches h30(rep)%100") {
    val docs = (1L to 6L).map(i => Tuple1(i)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSplit(docs, "doc_id", pairs, valPct = 10)
      .orderBy("doc_id")
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().toSeq
    // near-dups never straddle: same rep -> same split
    val byRep = out.groupBy(_._2).values
    assert(byRep.forall(g => g.map(_._3).distinct.size == 1))
    assert(out.map(_._2) === Seq(1L, 1L, 3L, 3L, 5L, 6L))
    // the rule itself, recomputed in the engine for each rep
    val reps = out.map(_._2).distinct
    val rule = reps.map(r => r -> spark.sql(
      s"SELECT pmod(CAST(conv(substring(md5('$r'), 1, 8), 16, 10) " +
        s"AS BIGINT) % ${Dedup.P}, 100) < 10").collect()(0).getBoolean(0))
      .toMap
    assert(out.forall { case (_, rep, split) =>
      split == (if (rule(rep)) "val" else "train") })
  }

  test("corpusDiff: four statuses, extras coalesced old-first") {
    import graft.warehouse.Snapshot
    val old = Seq((1L, "h1", "a"), (2L, "h2", "a"), (3L, "h3", "b"))
      .toDF("id", "h", "src")
    val nw = Seq((1L, "h1", "a"), (2L, "h2x", "a2"), (4L, "h4", "c"))
      .toDF("id", "h", "src")
    val got = Snapshot.corpusDiff(old, nw, "id", "h")
      .orderBy("id").select("id", "src", "status")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "unchanged"),
      (2L, "a", "changed"), // extras coalesce OLD-first ("a", not "a2")
      (3L, "b", "removed"),
      (4L, "c", "added")))
  }

  test("corpusDiff: null content hashes are presence, not absence") {
    import graft.warehouse.Snapshot
    // id 1: present both sides, null old hash -> CHANGED (not 'added');
    // id 2: only in old with a null hash -> REMOVED (not 'added');
    // id 3: null hash BOTH sides -> unchanged (null-safe equality)
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "h")
    val nw = Seq((1L, Some("h1")), (3L, Option.empty[String]))
      .toDF("id", "h")
    val got = Snapshot.corpusDiff(old, nw, "id", "h")
      .orderBy("id").select("id", "status")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "changed"), (2L, "removed"),
      (3L, "unchanged")))
  }

  test("mixturePlan: zero-token group yields null repeat factor") {
    val docs = Seq(("A", 0L), ("A", 0L), ("B", 50L)).toDF("g", "toks")
    val got = Sampling.mixturePlan(docs, "g", "toks",
        Map("A" -> 0.5, "B" -> 0.5), totalBudget = 100L)
      .orderBy("g")
      .select("g", "available_tokens", "target_tokens",
        "repeat_factor", "action")
      .as[(String, Long, Long, Option[Double], String)].collect().toSeq
    // A has docs but zero tokens: no finite repeat factor exists ->
    // null (never Infinity); the action still reads 'repeat'
    assert(got === Seq(("A", 0L, 50L, None, "repeat"),
      ("B", 50L, 50L, Some(1.0), "exact")))
  }

  test("mixturePlan: targets, repeat factors, and actions") {
    val docs = Seq(("A", 100L), ("A", 100L), ("B", 50L), ("C", 1L))
      .toDF("g", "toks")
    val got = Sampling.mixturePlan(docs, "g", "toks",
        Map("A" -> 0.5, "B" -> 0.5), totalBudget = 200L)
      .orderBy("g")
      .select("g", "available_tokens", "target_tokens",
        "repeat_factor", "action")
      .as[(String, Long, Long, Double, String)].collect().toSeq
    // A: 200 available, target 100 -> subsample at 0.5; B: 50
    // available, target 100 -> repeat at 2.0; C not in the mixture
    assert(got === Seq(("A", 200L, 100L, 0.5, "subsample"),
      ("B", 50L, 100L, 2.0, "repeat")))
  }

  test("clusterSplit never leaks a pair; per-doc hash split does") {
    // pick two ids whose h30 % 100 land on opposite sides of 10 so a
    // DOC-keyed split provably separates them; the CLUSTER-keyed
    // split cannot
    def h30pct(i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).take(4).map("%02x".format(_))
        .mkString
      (java.lang.Long.parseLong(d, 16) % Dedup.P) % 100
    }
    val va = (1L to 500L).find(h30pct(_) < 10).get
    val tr = (1L to 500L).find(h30pct(_) >= 10).get
    val docs = Seq(va, tr).toDF("doc_id")
    val pairs = Seq((math.min(va, tr), math.max(va, tr)))
      .toDF("id_a", "id_b")
    val clustered = Dedup.clusterSplit(docs, "doc_id", pairs, 10)
      .select("split").as[String].collect().distinct
    assert(clustered.length === 1, "cluster split must not straddle")
    // doc-keyed rule on the same two ids straddles by construction
    assert(Set(h30pct(va) < 10, h30pct(tr) < 10).size === 2)
  }

  test("clusterSplit: valPct 0 and 100 are total") {
    val docs = (1L to 5L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val all0 = Dedup.clusterSplit(docs, "doc_id", pairs, 0)
      .select("split").as[String].collect()
    val all100 = Dedup.clusterSplit(docs, "doc_id", pairs, 100)
      .select("split").as[String].collect()
    assert(all0.forall(_ == "train") && all100.forall(_ == "val"))
  }
}
