package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Similarity, TextAnalysis}

/** Near-dup operator semantics on controlled corpora. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content entirely unrelated"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "a b")) // fewer than 3 tokens → no shingles
    .toDF("doc_id", "text")

  test("shingles: short docs yield empty sets, no descending-sequence bug") {
    val s = docs.select(col("doc_id"),
      size(Dedup.shingles(col("text"), 3)).as("n")).orderBy("doc_id")
      .collect().map(_.getInt(1))
    assert(s.toSeq == Seq(7, 7, 3, 7, 0))
  }

  test("exact dedup groups identical texts") {
    val g = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(g.length == 1 && g(0).getAs[Long]("keep_id") == 1L)
  }

  test("ngram jaccard finds the near-pair, skips unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("maxDf drops stop-shingles from pairs AND set sizes") {
    import spark.implicits._
    val docs = Seq((1L, "x common"), (2L, "x common"),
      (3L, "common y"), (4L, "common z")).toDF("doc_id", "text")
    // without a cap: (1,2) share both tokens (j=1.0); every other pair
    // shares only 'common' (j=1/3, below threshold)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 1, threshold = 0.5).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(exact.toSeq == Seq((1L, 2L, 2L, 2L, 2L, 1.0)))
    // maxDf=2 drops 'common' (df=4): candidates come from 'x' alone
    // and set sizes shrink to the CAPPED universe (1 each) — sizes
    // from the unfiltered index would report j=1/3 and miss the pair
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 1, threshold = 0.5, maxDf = Some(2)).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(capped.toSeq == Seq((1L, 2L, 1L, 1L, 1L, 1.0)))
  }

  test("skew rehearsal: a shingle in 50% of docs blows up candidate " +
      "pairs quadratically; maxDf bounds it") {
    import spark.implicits._
    // 200 docs; 'common' appears in docs 0-99 (df=100 — one shingle in
    // HALF the corpus, the classic boilerplate/stop-shingle skew), the
    // rest are unique tokens. Two genuine duplicate pairs: (0,1) share
    // all their tokens, (150,151) likewise.
    val docs = (0L until 200L).map { i =>
      val text =
        if (i <= 1) "common dupA dupB"
        else if (i < 100) s"common u$i"
        else if (i == 150L || i == 151L) "rareX rareY"
        else s"u$i only$i"
      (i, text)
    }.toDF("doc_id", "text")
    // threshold ~0 makes every candidate pair survive the jaccard
    // filter, so the row count IS the candidate-pair count the join
    // materialized. Unguarded: C(100,2) pairs from 'common' alone
    // (+1 disjoint rare pair) — the n² hot-key blowup a 100 TB corpus
    // cannot afford.
    val unguarded = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.01, autoStopShingles = false).count()
    assert(unguarded == 100L * 99 / 2 + 1,
      s"expected 4951 candidate pairs from the hot shingle, got $unguarded")
    // maxDf=50 drops 'common' (df=100) from the inverted index: the
    // candidate space collapses to the genuinely-shared rare shingles
    val guarded = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.01, maxDf = Some(50)).count()
    assert(guarded == 2L,
      s"expected 2 candidate pairs under the maxDf guard, got $guarded")
    // and the DEFAULT config already applies the guard: the auto
    // stop-shingle cap max(floor=64, 1% of 200 docs) = 64 < df(common)
    // — unbounded exact semantics now require the explicit opt-out
    val default = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.01).count()
    assert(default == 2L,
      s"expected the auto stop-shingle cap to drop the hot shingle, got $default")
    // and the guard costs no recall at a real threshold: both true
    // duplicate pairs are still found
    val found = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 1, threshold = 0.5, maxDf = Some(50))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L), (150L, 151L)))
  }

  test("PPJoin paths (broadcast + shuffle verify) ≡ naive self-join") {
    import spark.implicits._
    // near-dup chains, a disjoint cluster, varied lengths: exercises
    // the size filter (length outliers), the positional filter (late
    // single collisions) and prefix completeness (every true pair)
    val corpus = (0L until 120L).map { i =>
      val fam = i % 6
      val base = s"alpha$fam beta$fam gamma$fam delta$fam " +
        s"epsilon$fam zeta$fam eta$fam theta$fam"
      val text =
        if (i % 3 == 0) base
        else if (i % 3 == 1) base + s" extra$i"
        else base.replace(s"zeta$fam", s"zz$i")
      (i, text)
    }.toDF("doc_id", "text")
    def run(): Seq[(Long, Long, Long, Long, Long, Double)] =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 2, threshold = 0.5)
        .orderBy("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val naive = run() // Σdf² tiny → naive branch
    assert(naive.nonEmpty, "corpus must produce qualifying pairs")
    try {
      spark.conf.set("spark.graft.jaccardNaiveMaxDf2", "0")
      val ppjoinBcast = run()
      assert(ppjoinBcast == naive,
        "PPJoin broadcast-verify path must emit identical rows")
      spark.conf.set("spark.graft.jaccardBroadcastSetBytes", "0")
      val ppjoinShuffle = run()
      assert(ppjoinShuffle == naive,
        "PPJoin shuffle-verify path must emit identical rows")
    } finally {
      spark.conf.unset("spark.graft.jaccardNaiveMaxDf2")
      spark.conf.unset("spark.graft.jaccardBroadcastSetBytes")
    }
  }

  test("minhash-LSH candidates include the exact duplicate at est 1.0") {
    val cand = Dedup.minHashLshCandidates(docs, "doc_id", "text")
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()
    assert(cand.length == 1)
    assert(cand(0).getAs[Double]("est_jaccard") == 1.0)
  }

  test("simhash: identical texts share fingerprints, different differ") {
    val fp = Dedup.simHash(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(fp(0) == fp(3) && fp(0) != fp(2))
    assert(fp(0).matches("[0-9a-f]{16}"))
  }

  test("bucketed near-dups are a subset of exact near-dups") {
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupsBucketed(
        emb, "vec_id", "embedding", 0.9, bits = 4, dim = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact))
    assert(bucketed.nonEmpty) // high-cosine pairs share sign buckets
  }

  test("KMV sketch: exact below k, estimate within bounds above") {
    import spark.implicits._
    import graft.analytics.{Dedup, Sketches}
    val small = (1 to 40).map(i => ("a", i.toLong)).toDF("g", "id")
    val big = (1 to 5000).map(i => ("b", i.toLong)).toDF("g", "id")
    val got = small.unionByName(big)
      .groupBy("g")
      .agg(Sketches.kmvDistinct(Dedup.h30($"id".cast("string")), 64)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 40.0)                       // below k: exact
    assert(got("b") > 3500 && got("b") < 7000)     // KMV estimate band
    // duplicates do not move the estimate (distinct semantics)
    val dup = big.unionByName(big)
      .groupBy("g")
      .agg(Sketches.kmvDistinct(Dedup.h30($"id".cast("string")), 64)
        .as("est"))
      .collect()(0).getDouble(1)
    assert(dup == got("b"))
  }

  test("hash reservoir: equals brute-force k-minima, survives " +
      "repartitioned merges, bounds its sample") {
    import spark.implicits._
    import graft.analytics.{Dedup, Sketches}
    val rows = (1 to 500).map(i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd",
        (i % 97).toDouble / 4.0))
    val df = rows.toDF("id", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(Sketches.hashReservoir(
        Dedup.h30($"id".cast("string")), $"v", 32).as("s"),
        Sketches.sampleQuantile(
          Sketches.hashReservoir(
            Dedup.h30($"id".cast("string")), $"v", 32), 0.5)
          .as("p50"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1).toList, r.getDouble(2)))).toMap
    val got = run(df)
    // brute force: same md5 arithmetic on the driver
    def h30(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16) % Dedup.P
    }
    for (g <- Seq("even", "odd")) {
      val expect = rows.filter(_._2 == g)
        .map(r => (h30(r._1.toString), r._3)).distinct.sorted.take(32)
        .map(_._2).toList
      assert(got(g)._1 === expect, s"group $g sample mismatch")
      assert(got(g)._1.size === 32)
      val p50 = expect.sorted.apply(
        math.floor(0.5 * (expect.size - 1)).toInt)
      assert(got(g)._2 === p50)
    }
    // merge path: many partitions -> partial buffers -> same result
    assert(run(df.repartition(13)) === got)
    // below-k group returns every value
    val tiny = Seq((1L, "t", 9.0), (2L, "t", 3.0)).toDF("id", "g", "v")
      .groupBy("g")
      .agg(Sketches.hashReservoir(
        Dedup.h30($"id".cast("string")), $"v", 32).as("s"))
      .collect()(0).getSeq[Double](1).toSet
    assert(tiny === Set(9.0, 3.0))
  }

  test("hash sampling is deterministic and caps groups exactly") {
    import spark.implicits._
    import graft.analytics.Sampling
    val df = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val capped = Sampling.capPerGroup(df, "g", col("id"), 10)
    val byG = capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 10L, "b" -> 10L))
    // same rows every run
    val again = Sampling.capPerGroup(df, "g", col("id"), 10)
    assert(capped.orderBy("id").collect().toSeq ==
      again.orderBy("id").collect().toSeq)
    // fraction filter keeps a stable subset of roughly the right size
    val frac = df.filter(Sampling.hashFraction(col("id"), 0.3))
    val n = frac.count()
    assert(n > 30 && n < 90)
    assert(frac.orderBy("id").collect().toSeq ==
      df.filter(Sampling.hashFraction(col("id"), 0.3))
        .orderBy("id").collect().toSeq)
  }

  test("connected components: chains merge, singletons keep min rep") {
    import spark.implicits._
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; {10,11}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 7L), (11L, 10L))
      .toDF("id_a", "id_b")
    val got = graft.analytics.Dedup
      .connectedComponents(pairs, "id_a", "id_b")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (7L, 5L), (9L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("star CC matches min-label propagation on a mixed graph") {
    import spark.implicits._
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 7L), (11L, 10L))
      .toDF("id_a", "id_b")
    val star = graft.analytics.Dedup
      .connectedComponentsStar(pairs, "id_a", "id_b")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(star.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (7L, 5L), (9L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("star CC converges on a long chain within few rounds") {
    import spark.implicits._
    // path graph 0-1-2-…-59: diameter 59; min-label propagation would
    // need 59 rounds (its default cap raises), star contraction a
    // handful
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.analytics.Dedup
      .connectedComponentsStar(chain, "id_a", "id_b", maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 60)
    assert(got.forall(_._2 == 0L))
  }

  test("star CC matches propagation on a deterministic random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(120)((rnd.nextInt(80).toLong,
      rnd.nextInt(80).toLong)).filter(p => p._1 != p._2)
      .toDF("id_a", "id_b")
    val a = graft.analytics.Dedup
      .connectedComponents(pairs, "id_a", "id_b", maxIter = 80)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = graft.analytics.Dedup
      .connectedComponentsStar(pairs, "id_a", "id_b")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("star CC local fast path ≡ distributed loop on the same graph") {
    import spark.implicits._
    // small edge sets short-circuit to a driver union-find (the
    // broadcast-threshold analogue); forcing the limit to 0 runs the
    // distributed contraction on the identical input — labels must
    // match row for row, including the singleton from the self-pair
    val rnd = new scala.util.Random(7)
    val pairs = (Seq.fill(150)((rnd.nextInt(60).toLong,
      rnd.nextInt(60).toLong)) :+ ((99L, 99L)))
      .toDF("id_a", "id_b")
    val local = graft.analytics.Dedup
      .connectedComponentsStar(pairs, "id_a", "id_b")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.conf.set("spark.graft.ccLocalEdgeLimit", "0")
    try {
      val dist = graft.analytics.Dedup
        .connectedComponentsStar(pairs, "id_a", "id_b")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(local.toSeq === dist.toSeq)
    } finally spark.conf.unset("spark.graft.ccLocalEdgeLimit")
  }

  test("star CC local path orders string ids in UTF-8 byte order " +
      "(Spark's), and non-fast-path id types take the distributed loop") {
    import spark.implicits._
    // U+FFFF vs an emoji (supplementary plane): Java String '<' (UTF-16
    // code units) sorts the emoji FIRST, Spark's UTF8String (UTF-8
    // bytes) sorts U+FFFF first — the local path must agree with Spark
    val hi = "￿"
    val emoji = new String(Character.toChars(0x1F600))
    val pairs = Seq((hi, emoji)).toDF("id_a", "id_b")
    val local = graft.analytics.Dedup
      .connectedComponentsStar(pairs, "id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    spark.conf.set("spark.graft.ccLocalEdgeLimit", "0")
    val dist =
      try graft.analytics.Dedup
        .connectedComponentsStar(pairs, "id_a", "id_b")
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      finally spark.conf.unset("spark.graft.ccLocalEdgeLimit")
    assert(local === dist)
    assert(local(emoji) == hi && local(hi) == hi) // UTF-8 byte minimum
    // a type with no proven driver ordering (decimal) must silently
    // run the distributed loop, not crash in the fast path
    val dec = Seq((BigDecimal(2), BigDecimal(1)), (BigDecimal(2),
      BigDecimal(3))).toDF("id_a", "id_b")
    val got = graft.analytics.Dedup
      .connectedComponentsStar(dec, "id_a", "id_b")
      .collect().map(r => (r.getDecimal(0).longValue,
        r.getDecimal(1).longValue)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star CC skew rehearsal: a 1M-edge single-hub star contracts " +
      "through partial aggregation, not a single-task window sort") {
    import spark.implicits._
    // one representative with component-sized degree — the exact shape
    // that made the old window-based neighborhood min a scale hazard
    // (no map-side partials ⇒ the hub's whole neighborhood through one
    // task). The groupBy.min building block partial-aggregates: its
    // plan must be a HashAggregate pair with NO Window node.
    val hub = spark.range(1, 1000001)
      .select(col("id").as("id_a"), lit(0L).as("id_b"))
    val bidir = hub.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(hub.select(col("id_b").as("u"), col("id_a").as("v")))
    val plan = graft.analytics.Dedup.neighborhoodMin(bidir, "u", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    val got = graft.analytics.Dedup
      .connectedComponentsStar(hub, "id_a", "id_b", maxIter = 10)
    assert(got.count() === 1000001L)
    assert(got.filter(col("cluster_rep") =!= 0L).isEmpty)
  }

  test("keepRepresentatives: one survivor per cluster with member " +
      "count, singletons kept, all original columns carried") {
    import spark.implicits._
    val corpus = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30),
      (5L, "d", 50), (7L, "e", 70), (9L, "f", 90))
      .toDF("doc_id", "text", "n_chars")
    // clusters: {1,2,3} and {5,7}; 9 is in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("id_a", "id_b")
    val kept = graft.analytics.Dedup
      .keepRepresentatives(corpus, "doc_id", pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3)))
    assert(kept.toSeq === Seq((1L, "a", 10, 3L), (5L, "d", 50, 2L),
      (9L, "f", 90, 1L)))
  }

  test("incremental assign: new docs join existing clusters " +
      "append-only, unmatched new docs form fresh clusters") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    // existing corpus clusters: {1,2} rep 1, {4,6} rep 4; old doc 3 is
    // a singleton absent from the assignment table (its own rep).
    // New batch = ids divisible by 5.
    val oldLabels = Seq((1L, 1L), (2L, 1L), (4L, 4L), (6L, 4L))
      .toDF("doc_id", "cluster_rep")
    val pairs = Seq(
      (0L, 2L),   // new 0 matches cluster {1,2}       -> rep 1
      (3L, 5L),   // new 5 matches old singleton 3     -> rep 3
      (5L, 10L),  // new 10 chains to 5, inherits 3    -> rep 3
      (15L, 2L),  // new 15 bridges clusters 1 and 4:
      (15L, 4L),  //   reports the smaller rep; old clusters untouched
      (20L, 25L)) // new-new only                      -> fresh cluster 20
      .toDF("id_a", "id_b")
    val isOld = (c: Column) => c % 5 =!= 0
    val got = graft.analytics.Dedup
      .incrementalAssign(pairs, "id_a", "id_b", oldLabels, isOld)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set(
      (0L, 1L, 1), (5L, 3L, 1), (10L, 3L, 1), (15L, 1L, 1),
      (20L, 20L, 0), (25L, 20L, 0)))
  }

  test("simhash banded near-dups find exactly the brute-force pairs " +
      "within hamming distance 3") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while " +
      "rain falls on the quiet green field near the old mill"
    val docs = Seq(
      (0L, base),
      (1L, base),                       // exact dup -> hamming 0
      (2L, base + " tonight"),          // near variant
      (3L, base.replace("quick", "slow")),
      (4L, "entirely different words about solar panels and batteries"),
      (5L, "unrelated text discussing ocean currents and tides today"))
      .toDF("doc_id", "text")
    val got = graft.analytics.Dedup
      .simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // brute force over the same fingerprints
    val fps = graft.analytics.Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        BigInt(r.getString(1), 16))).sortBy(_._1)
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = (fa ^ fb).bitCount if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got === brute, s"banded $got vs brute $brute")
    assert(got.contains((0L, 1L, 0)), "exact dup pair at distance 0")
  }

  test("mixture sampling keeps per-group fractions deterministically " +
      "and excludes zero-fraction groups entirely") {
    import spark.implicits._
    import graft.analytics.Sampling
    val df = (0L until 4000L).map(i => (i, s"g${i % 2}"))
      .toDF("id", "g")
    def run() = Sampling.mixtureSample(df, "g", col("id"),
      Map("g0" -> 0.5, "g1" -> 0.0), defaultFraction = 1.0)
    val counts = run().groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!counts.contains("g1"), s"zero-fraction group leaked: $counts")
    assert(math.abs(counts("g0") - 1000L) < 150,
      s"expected ~half of g0's 2000 rows: $counts")
    val a = run().select("id").collect().map(_.getLong(0)).sorted
    val b = run().select("id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq, "same membership on every run")
  }

  test("negativeSample: replays the md5 draw exactly, never emits a " +
      "positive, and is repartition-invariant") {
    import spark.implicits._
    import graft.analytics.Sampling
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val items = (1L to 100L).toDF("item")
    // query 1 likes a spread of items; query 2 likes NOTHING in the
    // pool's reach except what the draw would pick first (forcing the
    // anti-join to visibly shift its ranking)
    val k = 3; val n = k * 4
    val pool = (1L to 100L).sortBy(i => (md5hex(i.toString), i)).take(n)
    val pos = Seq((1L, pool(0)), (1L, pool(2)), (2L, 999L))
      .toDF("q", "it")
    val got = Sampling.negativeSample(pos, "q", "it", items, "item",
        k = k, poolFactor = 4)
      .as[(Long, Long, Int)].collect().toSeq
    def expectFor(q: Long, liked: Set[Long]) =
      pool.filterNot(liked)
        .sortBy(i => (md5hex(s"$q|$i"), i)).take(k)
        .zipWithIndex.map { case (it, i) => (q, it, i + 1) }
    val want = expectFor(1L, Set(pool(0), pool(2))) ++
      expectFor(2L, Set(999L))
    assert(got === want)
    assert(got.forall { case (q, it, _) =>
      !Set((1L, pool(0)), (1L, pool(2))).contains((q, it)) })
    val shuffled = Sampling.negativeSample(pos.repartition(7), "q",
        "it", items.repartition(5), "item", k = k, poolFactor = 4)
      .as[(Long, Long, Int)].collect().toSeq
    assert(shuffled === want)
  }

  test("blockingProfile: size histogram with exact pair budgets") {
    import spark.implicits._
    // blocks by 2-char prefix: "aa" x3, "ab" x2, "zz" x1 and a
    // whitespace-normalized prefix ("a a..." -> block "a ")
    val docs = Seq((1L, "aaX"), (2L, "aay"), (3L, "aa z"),
      (4L, "abq"), (5L, "abr"), (6L, "zz"),
      (7L, "a    a tail"), (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.analytics.Dedup.blockingProfile(
        docs, "doc_id", "text", blockChars = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sizes: {3 -> 1 block (aa), 2 -> 1 (ab), 1 -> 2 (zz, "a ")}
    assert(got === Seq((1L, 2L, 2L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 3L)))
  }

  test("stratifiedFolds: per-stratum balance within one, " +
      "deterministic across runs") {
    import spark.implicits._
    import graft.analytics.Sampling
    val docs = ((1L to 23L).map(i => (i, "a")) ++
      (100L to 104L).map(i => (i, "b"))).toDF("id", "src")
    def run() = Sampling.stratifiedFolds(docs, "id", "src", k = 5)
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    val got = run()
    assert(got === run())
    val cells = got.groupBy(r => (r._2, r._3)).view.mapValues(_.size)
    // stratum a: 23 docs over 5 folds -> sizes {5,5,5,4,4}
    val aSizes = (0 until 5).map(f => cells.getOrElse(("a", f), 0))
    assert(aSizes.sum === 23 && aSizes.max - aSizes.min <= 1)
    // stratum b: 5 docs -> exactly one per fold
    (0 until 5).foreach(f => assert(cells(("b", f)) === 1))
  }

  test("tokenBudgetSelect: two-phase selection equals the naive " +
      "sorted-prefix on score ties and partial boundaries") {
    import spark.implicits._
    import graft.analytics.Sampling
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // scores with heavy ties; tokens vary; several budgets hit a
    // boundary mid-group
    val docs = (1L to 60L).map(i => (i, (i % 5) * 10L, i % 7 + 1L))
    val df = docs.toDF("doc_id", "score", "toks")
    for (budget <- Seq(0L, 17L, 55L, 120L, 100000L)) {
      val naive = docs
        .sortBy { case (id, s, _) => (-s, md5hex(id.toString), id) }
        .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, s, t)) =>
          (id, s, t, cum + t) }
        .drop(1).takeWhile(_._4 <= budget)
        .map { case (id, s, t, _) => (id, s, t) }.sortBy(_._1)
      val got = Sampling.tokenBudgetSelect(df.repartition(7),
          "doc_id", "score", "toks", budget)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === naive, s"budget $budget")
    }
  }

  test("shuffleAudit: hash order splits interleaved sources; a " +
      "planted single-source corpus reports all-same adjacency") {
    import spark.implicits._
    import graft.analytics.Sampling
    val single = (1L to 200L).map(i => (i, "only")).toDF("id", "g")
    val got = Sampling.shuffleAudit(single, "id", "g", buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum === 200L)
    // every adjacent pair within every bucket is same-source
    got.foreach { case (_, n, pairs, same) =>
      assert(pairs === n - 1 && same === pairs)
    }
    // two interleaved sources under hash order: adjacency mixes —
    // same-share must sit far below 1 (expected ~0.5)
    val mixed = (1L to 400L).map(i => (i, s"s${i % 2}"))
      .toDF("id", "g")
    val m = Sampling.shuffleAudit(mixed, "id", "g", buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    val share = m.map(_._4).sum.toDouble / m.map(_._3).sum
    assert(share > 0.3 && share < 0.7, s"same-adjacency share $share")
    val shuf = Sampling.shuffleAudit(mixed.repartition(7), "id", "g", 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(shuf.toSeq === m.toSeq)
  }

  test("negativeSample: a query whose positives saturate the pool " +
      "yields fewer than k") {
    import spark.implicits._
    import graft.analytics.Sampling
    val items = (1L to 8L).toDF("item")
    // pool is ALL 8 items (k·poolFactor = 8); query likes 6 of them
    val pos = (1L to 6L).map(i => (7L, i)).toDF("q", "it")
    val got = Sampling.negativeSample(pos, "q", "it", items, "item",
      k = 4, poolFactor = 2).collect()
    assert(got.length === 2)
    assert(got.map(_.getLong(1)).toSet === Set(7L, 8L))
  }

  test("incremental assign fails fast on ids outside [0, offset)") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    val labels = Seq((1L, 1L)).toDF("doc_id", "cluster_rep")
    val pairs = Seq((150L, 1L)).toDF("id_a", "id_b")
    val isOld = (c: Column) => c % 5 =!= 0 // 150 % 5 == 0 -> "new"
    val e = intercept[Exception] {
      graft.analytics.Dedup.incrementalAssign(pairs, "id_a", "id_b",
        labels, isOld, offset = 100L).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("outside [0, 100)")),
      s"expected range error, got: $msgs")
  }

  test("language-ID picks the profile with most stopword hits") {
    assert(evalStr("der hund und die katze ist nicht hier",
      TextAnalysis.langPredict) == "de")
    assert(evalStr("the dog and the cat is here",
      TextAnalysis.langPredict) == "en")
    assert(evalStr("xyzzy plugh", TextAnalysis.langPredict) == "und")
  }

  test("weightedPriority: deterministic, weight-biased, 12-decimal quantized") {
    import spark.implicits._
    import graft.analytics.Sampling
    // 1000 rows, half weight 50, half weight 1
    val df = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) 50L else 1L)).toDF("id", "w")
    def top100(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select(col("id"), col("w"),
          Sampling.weightedPriority(col("id"), col("w")).as("p"))
        .orderBy(col("p").desc, col("id")).limit(100)
        .collect().map(_.getLong(0)).toSeq
    val a = top100(df)
    assert(a === top100(df.repartition(9)))   // hash-determined, not rand()
    // E-S: inclusion probability increases with weight — the 50×
    // class must dominate the sample
    val heavy = a.count(_ % 2 == 0)
    assert(heavy > 80, s"weight-50 rows in top-100: $heavy")
    // quantization contract: every priority exact at 12 decimals
    df.select(Sampling.weightedPriority(col("id"), col("w")).as("p"))
      .collect().foreach { r =>
        val p = r.getDouble(0)
        assert(math.round(p * 1e12) / 1e12 === p)
      }
  }

  test("topKByHash equals the window-rank form, incl. hash ties") {
    import spark.implicits._
    import graft.analytics.Sampling
    val df = (0L until 500L).map(i =>
      (i, s"g${i % 4}", i * 7 % 100)).toDF("id", "g", "v")
    // forced collisions: only 5 distinct hash values → ties resolved
    // by id, exactly as the window ORDER BY (h, id) resolves them
    val h = pmod(col("id") * 31L, lit(5L))
    val viaAgg = df.groupBy("g")
      .agg(Sampling.topKByHash(7, h, col("id"), "v" -> col("v"))
        .as("kept"))
      .select(col("g"), explode(col("kept")).as("r"))
      .select(col("g"), col("r.v").as("v"))
      .orderBy("g", "v").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(h, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7).select("g", "v")
      .orderBy("g", "v").collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 28)
    // partitioning-insensitive (merge order must not matter)
    val again = df.repartition(13).groupBy("g")
      .agg(Sampling.topKByHash(7, h, col("id"), "v" -> col("v"))
        .as("kept"))
      .select(col("g"), explode(col("kept")).as("r"))
      .select(col("g"), col("r.v").as("v"))
      .orderBy("g", "v").collect().toSeq
    assert(again === viaAgg)
  }

  test("containmentPairs: directional threshold, hand-computed") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z w"),             // 2-shingles {xy, yz, zw}, sz 3
      (2L, "q x y z w r"),         // {qx, xy, yz, zw, wr}, sz 5
      (3L, "a b c d"))             // disjoint
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text",
        n = 2, tauNum = 4, tauDen = 5)
      .orderBy("id_a", "id_b").collect()
    // 1⊆2 fully (3/3 = 1.0 ≥ 0.8); 2 only 3/5 = 0.6 contained in 1
    assert(got.length === 1)
    assert(got(0).getAs[Long]("id_a") === 1L)
    assert(got(0).getAs[Long]("id_b") === 2L)
    assert(got(0).getAs[Long]("i") === 3L)
    assert(got(0).getAs[Double]("containment") === 1.0)
    // a df cap that kills the shared shingles empties the result
    assert(Dedup.containmentPairs(d, "doc_id", "text", 2, 4, 5,
      maxDf = Some(1L)).count() === 0L)
  }

  test("jaccard broadcast-verify ceiling: conf overrides, auto ≥ 256 MB") {
    spark.conf.set("spark.graft.jaccardBroadcastSetBytes", "12345")
    try assert(Dedup.broadcastSetBytesCeiling(spark) === 12345L)
    finally spark.conf.unset("spark.graft.jaccardBroadcastSetBytes")
    val auto = Dedup.broadcastSetBytesCeiling(spark)
    assert(auto >= 268435456L)
    assert(auto >= Runtime.getRuntime.maxMemory / 8 ||
      auto === 268435456L)
  }

  test("containmentPairs: stop-shingle cap on by default, opt-out exact") {
    import spark.implicits._
    // 100 docs all sharing boilerplate "aa bb"; docs 1/2 additionally
    // share unique content. With the default config the floor (64)
    // binds: the boilerplate shingle (df=100) leaves the universe, so
    // only the content-pair survives and its sizes shrink accordingly.
    val docs = (1 to 100).map {
      case 1 => (1L, "aa bb u1 u2 u3")
      case 2 => (2L, "aa bb u1 u2 u3 zz")
      case i => (i.toLong, s"aa bb w$i")
    }.toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 2, tauNum = 3, tauDen = 4)
      .where(col("id_a") === 1L && col("id_b") === 2L).collect()
    // doc1 capped universe: {u1u2, u2u3} plus bbu1 (df=2) → sz 3, all in doc2
    assert(capped.length === 1 && capped(0).getAs[Long]("sz_a") === 3L)
    // explicit opt-out restores the unbounded exact semantics:
    // doc1's full universe {aa bb, bb u1, u1 u2, u2 u3} → sz 4
    val exact = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 2, tauNum = 3, tauDen = 4, autoStopShingles = false)
      .where(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(exact.length === 1 && exact(0).getAs[Long]("sz_a") === 4L)
  }

  test("topKByHash: null payloads survive, output keeps (hash,id) order") {
    import spark.implicits._
    import graft.analytics.Sampling
    val df = Seq(
      (1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "s")
    val kept = df.groupBy()
      .agg(Sampling.topKByHash(3, col("id"), col("id"),
        "s" -> col("s"), "id2" -> (col("id") * 10)).as("k"))
      .select(explode(col("k")).as("r"))
      .select(col("r.s"), col("r.id2")).collect()
    assert(kept.map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("a"), None, Some("c")))
    assert(kept.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
  }

  test("crossCorpusJaccardPairs: only cross-side pairs, hand-checked J") {
    import spark.implicits._
    val a = Seq(
      (1L, "w1 w2 w3 w4 w5"),        // near-dup of B's 11
      (2L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val b = Seq(
      (11L, "w1 w2 w3 w4 w6"),       // shares 2 of its 3-shingles? see calc
      (12L, "w1 w2 w3 w4 w5"),       // exact dup of A's 1
      (13L, "z1 z2 z3 z4 z5")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusJaccardPairs(a, b, "doc_id", "text",
        n = 3, threshold = 0.5, autoStopShingles = false)
      .orderBy("id_a", "id_b").collect()
    // A1 vs B12: identical 3-shingle sets (3 shingles) -> J = 1.0
    // A1 vs B11: shingles {w1w2w3, w2w3w4} shared of 3+3 -> J = 2/4 = 0.5
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
      .toSeq === Seq((1L, 11L, 0.5), (1L, 12L, 1.0)))
    // left ids always from A, right ids always from B — B11-B12 are
    // near-identical but never pair (same side)
    assert(got.forall(r => r.getLong(0) < 10L && r.getLong(1) >= 10L))
  }

  test("crossCorpusJaccardPairs: overlapping id spaces are legal") {
    import spark.implicits._
    val a = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val b = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusJaccardPairs(a, b, "doc_id", "text",
        n = 2, threshold = 0.9, autoStopShingles = false).collect()
    assert(got.length == 1 &&
      got(0).getLong(0) == 1L && got(0).getLong(1) == 1L &&
      got(0).getDouble(5) == 1.0)
  }

  test("crossCorpusJaccardPairs: df cap over the COMBINED corpus") {
    import spark.implicits._
    // shingle "c c" appears once per side: per-side df 1, combined 2
    val a = Seq((1L, "c c c")).toDF("doc_id", "text")
    val b = Seq((2L, "c c c")).toDF("doc_id", "text")
    val capped = Dedup.crossCorpusJaccardPairs(a, b, "doc_id", "text",
      n = 2, threshold = 0.1, maxDf = Some(1))
    assert(capped.count() == 0L) // combined df=2 > cap=1 -> dropped
    val uncapped = Dedup.crossCorpusJaccardPairs(a, b, "doc_id", "text",
      n = 2, threshold = 0.1, autoStopShingles = false)
    assert(uncapped.count() == 1L)
  }

  test("crossCorpusJaccardPairs: prefix-filtered path is row-identical") {
    import spark.implicits._
    // a corpus rich enough that prefixes actually prune; force the
    // PPJoin path by zeroing the naive-cost budget and compare
    // row-for-row against the naive join (the default at this size)
    val a = (1 to 40).map(i =>
      (i.toLong, s"w$i w${i + 1} w${i + 2} w${i + 3} shared tail x$i"))
      .toDF("doc_id", "text")
    val b = (1 to 40).map(i =>
      (100L + i, s"w$i w${i + 1} w${i + 2} w${i + 3} shared tail y$i"))
      .toDF("doc_id", "text")
    def run() = Dedup.crossCorpusJaccardPairs(a, b, "doc_id", "text",
        n = 2, threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    val naive = run()
    assert(naive.nonEmpty)
    spark.conf.set("spark.graft.jaccardNaiveMaxDf2", "-1")
    try {
      val prefixed = run()
      assert(prefixed === naive)
      // and the shuffle-verify fallback (tiny broadcast ceiling)
      // produces the same rows too
      spark.conf.set("spark.graft.jaccardBroadcastSetBytes", "1")
      assert(run() === naive)
    } finally {
      spark.conf.unset("spark.graft.jaccardNaiveMaxDf2")
      spark.conf.unset("spark.graft.jaccardBroadcastSetBytes")
    }
  }

  test("sortedNeighborhood: window bound, edit gate, block scoping") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha document one"),
      (2L, "alpha document two"),     // 3 edits from doc 1 -> pair
      (3L, "alpha ZZZZZZZZ ZZZZZZZZ"), // same block, > 5 edits
      (4L, "beta document one"))       // different block
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        keyChars = 32, blockChars = 2, window = 3, maxDist = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("sortedNeighborhood: rank-bucket band join finds all in-window pairs") {
    import spark.implicits._
    // 8 near-identical docs in one block: window=3 must yield every
    // pair with rank gap <= 3 and no others, across bucket borders
    val docs = (1 to 8).map(i => (i.toLong, s"same prefix doc $i"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        keyChars = 32, blockChars = 2, window = 3, maxDist = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      i <- 1 to 8; j <- i + 1 to math.min(i + 3, 8)
    } yield (i.toLong, j.toLong)).toSet
    assert(got === want)
  }

  test("editVerifiedPairs: full-text verify separates near from far") {
    import spark.implicits._
    // docs 1/2 share the key AND the tail (1 edit in 100+ chars →
    // dup); docs 1/3 share only the 32-char key (divergent tails →
    // candidate survives SNM but fails the full-text verify)
    val shared = "alpha document with a stable key prefix "
    val docs = Seq(
      (1L, shared + "and a long common tail that repeats itself"),
      (2L, shared + "and a long common tail that repeats itsekf"),
      (3L, shared + "XXXX XXXX XXXX XXXX XXXX XXXX XXXX XXXX XX"))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        keyChars = 32, blockChars = 2, window = 3, maxKeyDist = 5,
        verifyChars = 240, maxRel = 0.2)
      .select("id_a", "id_b", "lev", "is_dup")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, 2L)) === ((1L, true)))
    val far = got.collect {
      case (p, (_, dup)) if p != ((1L, 2L)) => dup }
    assert(far.nonEmpty && far.forall(_ == false))
  }

  test("editVerifiedPairs: rel is lev over the longer verify window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "prefix prefix prefix prefix abcd"),
      (2L, "prefix prefix prefix prefix abzz tail"))
      .toDF("doc_id", "text")
    val r = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        keyChars = 16, blockChars = 2, window = 3, maxKeyDist = 8,
        verifyChars = 240, maxRel = 0.5)
      .select("lev", "len_a", "len_b", "rel")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length === 1)
    val (lev, la, lb, rel) = r(0)
    assert((la, lb) === ((32L, 37L)))
    assert(rel === lev.toDouble / math.max(la, lb).toDouble)
  }

  test("executor-memory parse: unitless means MiB, not bytes") {
    // Spark's convention for spark.executor.memory: "4096" = 4096 MiB.
    // byteStringAsBytes would read it as 4096 bytes and collapse the
    // auto-sized PPJoin verify ceiling to the 256 MB floor.
    assert(Dedup.parseExecutorMemoryBytes("4096")
      === Some(4096L * 1024 * 1024))
    assert(Dedup.parseExecutorMemoryBytes("4g")
      === Some(4L * 1024 * 1024 * 1024))
    assert(Dedup.parseExecutorMemoryBytes("512m")
      === Some(512L * 1024 * 1024))
    assert(Dedup.parseExecutorMemoryBytes("not-a-size") === None)
  }
}
