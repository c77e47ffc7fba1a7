package graft

import graft.analytics.Dedup

/** Pins the 2^bits ∝ n rule behind `Dedup.embeddingNearDupsAuto` —
  * the q22-tier scale fix (fixed bits measured 228× for 10× vectors
  * at the sf10 rehearsal; this rule measured 3.8×). */
class AutoSignBitsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("autoSignBits: smallest width with expected bucket <= target") {
    // n <= 64 -> 1 (floor), then one bit per doubling
    assert(Dedup.autoSignBits(0, 32) === 1)
    assert(Dedup.autoSignBits(64, 32) === 1)
    assert(Dedup.autoSignBits(65, 32) === 2)
    assert(Dedup.autoSignBits(128, 32) === 2)
    assert(Dedup.autoSignBits(129, 32) === 3)
    assert(Dedup.autoSignBits(2000, 32) === 6)
    assert(Dedup.autoSignBits(20000, 32) === 10)
    assert(Dedup.autoSignBits(200000, 32) === 13)
    // expected bucket size n/2^bits <= target at every decade
    for (n <- Seq(1L, 100L, 10000L, 1000000L, 100000000L)) {
      val b = Dedup.autoSignBits(n, 32)
      assert(b === 24 || n.toDouble / (1L << b) <= 32.0,
        s"n=$n bits=$b bucket=${n.toDouble / (1L << b)}")
    }
    // clamped to 24 on any realistic corpus beyond ~half a billion
    assert(Dedup.autoSignBits(Long.MaxValue, 32) === 24)
  }

  test("autoNlist: sqrt rule, clamped to the codebook budget") {
    import graft.analytics.Similarity
    assert(Similarity.autoNlist(0) === 1)
    assert(Similarity.autoNlist(100) === 10)
    assert(Similarity.autoNlist(101) === 11)
    assert(Similarity.autoNlist(1000000) === 1000)
    assert(Similarity.autoNlist(Long.MaxValue) === 65536)
  }

  test("ivfTopKAuto equals ivfTopKWith at the chosen codebook") {
    import graft.analytics.Similarity
    val emb = (0L until 9L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 17 + d * 5) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.limit(2)
    val auto = Similarity.ivfTopKAuto(q, emb, k = 3, nprobe = 2,
        dim = 8).orderBy("query_id", "neighbor_id").collect()
    val cb = Similarity.kmeansCodebook(emb, "vec_id", "embedding",
      Similarity.autoNlist(9), 8, 2) // n=9 -> nlist=3
    val pinned = Similarity.ivfTopKWith(q, emb, cb, k = 3, nprobe = 2)
      .orderBy("query_id", "neighbor_id").collect()
    assert(auto.toSeq === pinned.toSeq)
  }

  test("signRecallModel: Goemans-Williamson retention, monotone") {
    // closed form: 1 - (1 - (1 - acos(s)/pi)^bits)^tables
    def m(b: Int, t: Int, s: Double) = Dedup.signRecallModel(b, t, s)
    // identical vectors always collide; orthogonal pairs retain
    // (1/2)^bits per table
    assert(m(8, 1, 1.0) === 1.0)
    assert(math.abs(m(1, 1, 0.0) - 0.5) < 1e-12)
    assert(math.abs(m(4, 1, 0.0) - 1.0 / 16) < 1e-12)
    // monotone: recall rises with similarity and tables, falls with
    // bits
    assert(m(4, 4, 0.8) > m(4, 4, 0.35))
    assert(m(4, 8, 0.35) > m(4, 4, 0.35))
    assert(m(6, 4, 0.35) < m(4, 4, 0.35))
  }

  test("autoSignTables: smallest T with model recall >= target") {
    def inv(b: Int, s: Double, r: Double) =
      Dedup.autoSignTables(b, s, r)
    // the q256 operating points (oracle replays these through the
    // same COUNT(*) gates — changing the rule must break this FIRST)
    assert(inv(3, 0.35, 0.8) === 7)
    assert(inv(4, 0.35, 0.8) === 11)
    assert(inv(6, 0.35, 0.8) === 30)
    assert(inv(4, 0.8, 0.8) === 4)
    // minimality + sufficiency: T meets the target (unless the
    // 64-table cap binds — an unreachable target stops at the cap,
    // documented), and T-1 never does
    for (b <- 1 to 8; s <- Seq(0.35, 0.6, 0.8); r <- Seq(0.5, 0.8, 0.95)) {
      val t = inv(b, s, r)
      if (t < 64)
        assert(Dedup.signRecallModel(b, t, s) >= r - 1e-12,
          s"bits=$b s=$s r=$r t=$t under-delivers")
      if (t > 1 && t < 64)
        assert(Dedup.signRecallModel(b, t - 1, s) < r,
          s"bits=$b s=$s r=$r t=$t not minimal")
    }
    // threshold 1.0 collides always: one table suffices; the cap
    // bounds an unreachable target
    assert(inv(24, 1.0, 0.99) === 1)
    assert(inv(24, 0.05, 0.99) === 64)
  }

  test("targetRecall routes through autoSignTables") {
    val emb = (0L until 70L).map { i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    // n=70 -> bits=2; autoSignTables(2, 0.35, 0.8) tables
    val t = Dedup.autoSignTables(2, 0.35, 0.8)
    val targeted = Dedup.embeddingNearDupsAuto(emb, "vec_id",
        "embedding", threshold = 0.35, targetRecall = Some(0.8))
      .orderBy("id_a", "id_b").collect()
    val pinned = Dedup.embeddingNearDupsBucketed(emb, "vec_id",
        "embedding", threshold = 0.35, bits = 2, tables = t)
      .orderBy("id_a", "id_b").collect()
    assert(targeted.toSeq === pinned.toSeq)
  }

  test("moderate-tau cap rule: unclamped demand, pinned boundaries") {
    // signTablesNeeded is autoSignTables BEFORE the clamp — the
    // routing decision reads it so the cap binding is visible
    assert(Dedup.signTablesNeeded(3, 0.35, 0.8) === 7L)
    assert(Dedup.signTablesNeeded(6, 0.35, 0.8) === 30L)
    assert(Dedup.signTablesNeeded(9, 0.35, 0.99) === 370L)
    assert(Dedup.signTablesNeeded(24, 0.05, 0.99) === 36410432L)
    // a fully-underflowed retention is an unreachable target
    assert(Dedup.signTablesNeeded(24, -1.0, 0.99) === Long.MaxValue)
    // the rule: route iff demand exceeds the cap
    assert(!Dedup.moderateTauExceedsCap(6, 0.35, 0.8, 64))
    assert(Dedup.moderateTauExceedsCap(6, 0.35, 0.8, 29))
    assert(!Dedup.moderateTauExceedsCap(6, 0.35, 0.8, 30))
    assert(Dedup.moderateTauExceedsCap(9, 0.35, 0.99, 64))
    // near-identity band stays on sign-LSH at warehouse widths (the
    // 100 TB recipe: tau >= 0.8 routes far later than moderate tau —
    // at bits=14 it still fits the cap where tau=0.35 demands 1000s)
    assert(!Dedup.moderateTauExceedsCap(14, 0.8, 0.8, 64))
    assert(Dedup.moderateTauExceedsCap(14, 0.35, 0.8, 64))
  }

  test("cap binding routes embeddingNearDupsAuto to the centroid tier") {
    val emb = (0L until 70L).map { i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    // n=70 -> bits=2; (tau=0.35, R=0.9) demands 5 tables > cap 2
    assert(Dedup.signTablesNeeded(2, 0.35, 0.9) === 5L)
    val routed = Dedup.embeddingNearDupsAuto(emb, "vec_id",
        "embedding", threshold = 0.35, targetRecall = Some(0.9),
        maxTables = 2)
      .orderBy("id_a", "id_b").collect()
    val centroid = graft.analytics.Similarity
      .embeddingNearDupsCentroid(emb, "vec_id", "embedding",
        threshold = 0.35, dim = 64)
      .orderBy("id_a", "id_b").collect()
    assert(routed.toSeq === centroid.toSeq)
    // same request under a loose cap stays on the sign-LSH inversion
    val unrouted = Dedup.embeddingNearDupsAuto(emb, "vec_id",
        "embedding", threshold = 0.35, targetRecall = Some(0.9),
        maxTables = 64)
      .orderBy("id_a", "id_b").collect()
    val pinned = Dedup.embeddingNearDupsBucketed(emb, "vec_id",
        "embedding", threshold = 0.35, bits = 2, tables = 5)
      .orderBy("id_a", "id_b").collect()
    assert(unrouted.toSeq === pinned.toSeq)
  }

  test("cap binding routes semanticContaminationAuto to exact scoring") {
    import graft.analytics.CorpusOps
    val emb = (0L until 80L).map { i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val bench = emb.filter(col("vec_id") < 8)
    val corpus = emb.filter(col("vec_id") >= 8)
    val routed = CorpusOps.semanticContaminationAuto(corpus, bench,
        "vec_id", "embedding", threshold = 0.35, targetRecall = 0.9,
        maxTables = 2)
      .orderBy("vec_id").collect()
    val exact = CorpusOps.semanticContaminationExact(corpus, bench,
        "vec_id", "embedding", threshold = 0.35)
      .orderBy("vec_id").collect()
    assert(routed.toSeq === exact.toSeq)
    // exact scoring is recall 1 by construction: every contaminated
    // verdict agrees with a brute-force recompute — and a corpus row
    // identical to a bench row is always flagged
    val planted = corpus.union(bench.limit(1)
      .withColumn("vec_id", col("vec_id") + 1000L))
    val flagged = CorpusOps.semanticContaminationExact(planted, bench,
        "vec_id", "embedding", threshold = 0.35)
      .filter(col("vec_id") === 1000L).collect()
    assert(flagged.length === 1 && flagged(0).getBoolean(3))
  }

  test("auto variant equals the bucketed form at the chosen width") {
    val emb = (0L until 70L).map { i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val auto = Dedup.embeddingNearDupsAuto(emb, "vec_id", "embedding",
        threshold = 0.35).orderBy("id_a", "id_b").collect()
    val pinned = Dedup.embeddingNearDupsBucketed(emb, "vec_id",
        "embedding", threshold = 0.35, bits = 2, tables = 4)
      .orderBy("id_a", "id_b").collect()
    assert(auto.toSeq === pinned.toSeq) // n=70 -> bits=2; auto t=4
  }
}
