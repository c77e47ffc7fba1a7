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
