package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Similarity

/** ANN-tier quality: recall@k of the approximate paths (IVF cell-probe
  * with a trained codebook, sign-bucket LSH) measured against the exact
  * brute-force top-k on a seeded clustered corpus — the spec-side
  * counterpart of the q75 oracle query, with explicit recall floors.
  */
class SimilaritySpec extends SparkSpec {

  private val Dim = 16
  private val K = 5

  /** Seeded clustered corpus: 4 well-separated ±1 sign-pattern cluster
    * directions in 16-d (mutually orthogonal, distinct sign patterns in
    * the leading dimensions — sign-LSH needs zero-centered data), 30
    * vectors each, small deterministic jitter that never flips a sign.
    * Cosine structure is strong, so a good ANN path should recover most
    * exact neighbors.
    */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(42)
    val centers = Seq(
      Array.tabulate(Dim)(_ => 1.0f),
      Array.tabulate(Dim)(i => if (i < 8) -1.0f else 1.0f),
      Array.tabulate(Dim)(i => if (i % 2 == 0) 1.0f else -1.0f),
      Array.tabulate(Dim)(i => if (i % 2 == 0) -1.0f else 1.0f))
    val rows = (0L until 120L).map { id =>
      val c = centers((id % 4).toInt)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f)
      (id, v.toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter(col("vec_id") < 8)
  private lazy val qids = queries.select(col("vec_id").as("query_id"))
  private lazy val exact = Similarity.bruteForceTopK(queries, corpus, K)

  private def avgRecall(approx: DataFrame, method: String): Double = {
    val rec = Similarity.recallAtK(qids, exact, approx, K, method)
    assert(rec.count() === 8, "one recall row per query")
    rec.agg(avg("recall")).collect()(0).getDouble(0)
  }

  test("codebook budget fences BOTH init paths: id-value AND " +
      "initSmallestK refuse before any driver collect") {
    // the initSmallestK seed collects k rows of dim-double embeddings
    // — codebook-sized driver state that must hit the same require as
    // the trained codebook itself (k grows as sqrt(n) under autoNlist,
    // so an unfenced seed would silently scale driver memory with the
    // corpus)
    val key = "spark.graft.maxCodebookDoubles"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, (3L * Dim).toString) // budget below k=4 x Dim
    try {
      for (smallest <- Seq(false, true)) {
        val e = intercept[IllegalArgumentException] {
          Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
            k = 4, dim = Dim, iterations = 1,
            initSmallestK = smallest)
        }
        assert(e.getMessage.contains("exceeds"), s"init=$smallest")
        assert(e.getMessage.contains("maxCodebookDoubles"))
      }
      // at the budget boundary both paths proceed
      spark.conf.set(key, (4L * Dim).toString)
      assert(Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
        k = 4, dim = Dim, iterations = 1,
        initSmallestK = true).count() === 4L)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("IVF with trained k-means codebook reaches recall@5 >= 0.9 " +
      "at nprobe=2 of 4 cells") {
    val codebook = Similarity.kmeansCodebook(corpus, "vec_id",
      "embedding", k = 4, dim = Dim, iterations = 2)
    val ivf = Similarity.ivfTopKWith(queries, corpus, codebook,
      k = K, nprobe = 2)
    val r = avgRecall(ivf, "ivf")
    assert(r >= 0.9, s"trained-IVF recall@5 was $r")
  }

  test("sign-bucket LSH reaches recall@5 >= 0.85 at 6 bits x 3 tables " +
      "on the clustered corpus") {
    val lsh = Similarity.bucketedTopK(queries, corpus, k = K, bits = 6,
      dim = Dim, tables = 3)
    val r = avgRecall(lsh, "lsh_bucket")
    assert(r >= 0.85, s"LSH recall@5 was $r")
  }

  test("sign buckets: a NaN projection counts as >= 0 (SQL NaN " +
      "ordering, matching DuckDB), a short vector fails loudly") {
    import spark.implicits._
    val nanRow = Seq((1L, Seq(Float.NaN, 1.0f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // every per-bit fold is NaN -> every bit set (both SQL engines
    // order NaN above all doubles)
    val b = nanRow.select(Similarity.signBucket(col("embedding"),
      bits = 3, dim = 4).as("b")).collect()(0).getInt(0)
    assert(b === 7)
    // a vector shorter than dim must error, not silently collapse the
    // corpus into bucket 0 (which would turn the LSH join all-pairs)
    val short = Seq((2L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      short.select(Similarity.signBucket(col("embedding"),
        bits = 3, dim = 4)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("sign_buckets")))
  }

  test("OR-amplification is monotone: 3-table LSH recall >= 1-table") {
    val one = avgRecall(Similarity.bucketedTopK(queries, corpus, k = K,
      bits = 6, dim = Dim, tables = 1), "lsh_1")
    val three = avgRecall(Similarity.bucketedTopK(queries, corpus, k = K,
      bits = 6, dim = Dim, tables = 3), "lsh_3")
    assert(three >= one, s"3-table $three < 1-table $one")
  }

  test("recallAtK reports 0 (not a missing row) for queries with an " +
      "empty approximate candidate set") {
    val empty = exact.filter(lit(false))
    val rec = Similarity.recallAtK(qids, exact, empty, K, "none")
      .collect()
    assert(rec.length === 8)
    assert(rec.forall(_.getAs[Double]("recall") === 0.0))
    assert(rec.forall(_.getAs[Int]("hits") === 0))
  }

  test("exact path is its own fixpoint: recall@5 of bruteForceTopK " +
      "against itself is 1.0") {
    val r = avgRecall(exact, "exact")
    assert(r === 1.0)
  }

  test("persisted IVF index: indexed query equals inline IVF, " +
      "appended vectors become findable, probes prune cell partitions") {
    val dir = tmpDir("graft-ivfidx")
    Similarity.buildIvfIndex(corpus, dir, k = 4, dim = Dim,
      iterations = 2)
    val codebook = spark.read.parquet(s"$dir/codebook")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq
    val inline = rows(Similarity.ivfTopKWith(queries, corpus, codebook,
      k = K, nprobe = 2))
    val indexed = rows(Similarity.ivfTopKIndexed(spark, dir, queries,
      k = K, nprobe = 2))
    assert(indexed === inline)
    // the probed-cell filter reaches the cells scan as a partition
    // predicate — the read touches nprobe/k of the index, not all of it
    val plan = Similarity.ivfTopKIndexed(spark, dir, queries.limit(1),
        k = K, nprobe = 1).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*cell".r
        .findFirstIn(plan).isDefined,
      s"expected a cell partition filter in:\n$plan")
    // ingest path: append an exact duplicate of vector 0 under a new
    // id; the indexed query now ranks it first for query 0 (score 1.0)
    Similarity.appendToIvfIndex(
      corpus.filter(col("vec_id") === 0)
        .select((col("vec_id") + 200).as("vec_id"), col("embedding")),
      dir)
    val after = Similarity.ivfTopKIndexed(spark, dir,
        queries.filter(col("vec_id") === 0), k = K, nprobe = 2)
      .filter(col("rn") === 1).collect()(0)
    assert(after.getLong(1) === 200L)
    assert(after.getDouble(2) > 0.9999)
  }

  test("IVF index health: cellstats persisted and append-folded, " +
      "drift skews cells, rebalance rebuilds read-equivalently") {
    val dir = tmpDir("graft-ivfheal")
    Similarity.buildIvfIndex(corpus, dir, k = 4, dim = Dim,
      iterations = 2)
    // stats agree with the cells table, per cell
    def sizes() = spark.read.parquet(s"$dir/cells")
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val st0 = Similarity.readCellStats(spark, dir).collect()
    assert(st0.map(_.getLong(1)).sum === 120L)
    st0.foreach(r => assert(r.getLong(1) === sizes()(r.getInt(0))))
    st0.foreach(r => assert(r.getDouble(2) > 0.0 &&
      r.getDouble(2) <= 1.0)) // clustered corpus: cosines positive
    val balanced = Similarity.ivfCellSkew(spark, dir)
    assert(balanced < 1.5, s"seeded corpus should balance, got $balanced")
    assert(!Similarity.rebalanceIvfIndexIfSkewed(spark, dir,
      maxOverMean = 1.6, dim = Dim))
    // DRIFTED ingest: a fifth direction the frozen codebook never
    // saw — every appended vector crowds into its nearest stale cell
    val rnd = new scala.util.Random(7)
    val c5 = Array.tabulate(Dim)(i => if (i < 4) 1.0f else -1.0f)
    import spark.implicits._
    val drift = (1000L until 1120L).map { id =>
      (id, c5.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq)
    }.toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(drift, dir)
    // append folded the batch into the stats (no full rescan needed)
    val st1 = Similarity.readCellStats(spark, dir).collect()
    assert(st1.map(_.getLong(1)).sum === 240L)
    st1.foreach(r => assert(r.getLong(1) === sizes()(r.getInt(0))))
    val skewed = Similarity.ivfCellSkew(spark, dir)
    assert(skewed > 1.6, s"drifted append should skew cells, got $skewed")
    // recall under drift, before and after the rebuild
    val dq = drift.filter(col("vec_id") < 1008L)
    val dqid = dq.select(col("vec_id").as("query_id"))
    val all = corpus.unionByName(drift)
    val ex = Similarity.bruteForceTopK(dq, all, K)
    def rec(approx: DataFrame): Double =
      Similarity.recallAtK(dqid, ex, approx, K, "x")
        .agg(avg("recall")).collect()(0).getDouble(0)
    val before = rec(Similarity.ivfTopKIndexed(spark, dir, dq,
      k = K, nprobe = 2))
    // the trigger fires at the same threshold that passed above
    assert(Similarity.rebalanceIvfIndexIfSkewed(spark, dir,
      maxOverMean = 1.6, dim = Dim))
    // read equivalence: the rebuilt index answers exactly like an
    // inline IVF trained the same way over the same stored vectors
    val inlineCb = Similarity.kmeansCodebook(all, "vec_id",
      "embedding", Similarity.autoNlist(240L), Dim, 2,
      initSmallestK = true)
    def rows(df: DataFrame) = df.orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(rows(Similarity.ivfTopKIndexed(spark, dir, dq, k = K,
        nprobe = 2))
      === rows(Similarity.ivfTopKWith(dq, all, inlineCb, k = K,
        nprobe = 2)))
    val after = rec(Similarity.ivfTopKIndexed(spark, dir, dq,
      k = K, nprobe = 2))
    assert(after >= 0.9, s"post-rebuild recall@5 was $after")
    assert(after >= before - 1e-9,
      s"rebuild must not lose recall: $before -> $after")
    // stats were rebuilt alongside
    assert(Similarity.readCellStats(spark, dir).collect()
      .map(_.getLong(1)).sum === 240L)
    // an SQ8 sibling shares the codebook: a float-only rebuild would
    // orphan its cell assignments, so it must refuse loudly
    val d2 = tmpDir("graft-ivfsq8guard")
    val cbG = Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
      4, Dim, 2) // driver-local: safe to share across both writes
    Similarity.buildIvfIndex(corpus, d2, k = 4, dim = Dim,
      iterations = 2, codebook = Some(cbG))
    Similarity.buildIvfIndexSq8(corpus, d2, k = 4, dim = Dim,
      iterations = 2, codebook = Some(cbG))
    val eg = intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, d2, dim = Dim)
    }
    assert(eg.getMessage.contains("SQ8 sibling"))
  }

  test("IVF-SQ8 index: quantized cell-probe reaches recall@5 >= 0.9 " +
      "and stores measurably fewer bytes than the float index") {
    import spark.implicits._
    val dir = tmpDir("graft-ivfsq8")
    // 64-dim synthetic corpus for the size comparison (16-dim toy
    // vectors would be parquet-overhead-dominated; built in-memory so
    // the suite has no dependency on generated bench data)
    val rnd11 = new scala.util.Random(11)
    val emb = (0L until 300L).map(i =>
      (i, Seq.fill(64)(rnd11.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(emb, s"$dir/f", k = 8, dim = 64,
      iterations = 1)
    Similarity.buildIvfIndexSq8(emb, s"$dir/q", k = 8, dim = 64,
      iterations = 1)
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else f.length()
      walk(new java.io.File(p))
    }
    val fB = bytes(s"$dir/f/cells"); val qB = bytes(s"$dir/q/cells_sq8")
    assert(qB < fB, s"sq8 cells $qB bytes !< float cells $fB bytes")
    // recall floor on the seeded clustered corpus
    Similarity.buildIvfIndexSq8(corpus, s"$dir/c", k = 4, dim = Dim,
      iterations = 2)
    val sq8 = Similarity.ivfTopKIndexedSq8(spark, s"$dir/c", queries,
      k = K, nprobe = 2)
    val r = avgRecall(sq8, "ivf_sq8")
    assert(r >= 0.9, s"IVF-SQ8 recall@5 was $r")
  }

  test("codebook requests over the driver-state budget fail loudly " +
      "instead of silently collecting gigabytes per Lloyd round") {
    spark.conf.set("spark.graft.maxCodebookDoubles", "32")
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
          k = 4, dim = Dim, iterations = 1) // 64 doubles > budget 32
      }
      assert(e.getMessage.contains("driver-state budget"))
    } finally spark.conf.unset("spark.graft.maxCodebookDoubles")
    // within budget still works (default budget restored)
    assert(Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
      k = 2, dim = Dim, iterations = 1).count() === 2L)
  }

  test("sq8 quantization drops zero and non-finite vectors instead " +
      "of emitting undefined scores") {
    import spark.implicits._
    val pathological = Seq(
      (1L, Seq(1.0f, 2.0f)),                       // fine
      (2L, Seq(0.0f, 0.0f)),                       // zero vector
      (3L, Seq(Float.NaN, 1.0f)),                  // NaN
      (4L, Seq(Float.PositiveInfinity, 1.0f)),     // Inf
      (5L, Seq(-3.0f, 0.5f)))                      // fine
      .toDF("vec_id", "embedding")
    val kept = Similarity.sq8Quantize(pathological, "vec_id", "embedding")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 5L))
  }

  test("int8 scalar quantization: codes saturate at exactly ±127 on " +
      "the max-abs dimension and never exceed it") {
    val coded = Similarity.sq8Quantize(corpus, "vec_id", "embedding")
    assert(coded.count() === 120, "no nonzero vector is dropped")
    val absMax = coded.select(
      aggregate(col("code"), lit(0L), (a, v) => greatest(a, abs(v)))
        .as("m"))
    val stats = absMax.agg(min("m").as("lo"), max("m").as("hi"))
      .collect()(0)
    // floor(±scale·127/scale + 0.5) = ±127: every vector's largest
    // |code| is exactly the int8 ceiling — full dynamic range used,
    // none overflowed
    assert(stats.getLong(0) === 127L)
    assert(stats.getLong(1) === 127L)
  }

  test("int8-quantized top-k reaches recall@5 >= 0.9 against the " +
      "exact float path") {
    val sq8 = Similarity.sq8TopK(queries, corpus, K)
    val r = avgRecall(sq8, "sq8")
    assert(r >= 0.9, s"sq8 recall@5 was $r")
  }

  test("packed int8 path returns the exact same top-k as the " +
      "long-array path (same integers, quarter the bytes)") {
    val unpacked = Similarity.sq8TopK(queries, corpus, K)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val packed = Similarity.sq8TopKPacked(queries, corpus, K)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(packed.toSeq === unpacked.toSeq)
    // packed codes really are one byte per dimension
    val lens = Similarity.sq8QuantizePacked(corpus, "vec_id", "embedding")
      .select(length(col("code")).as("l")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq === Seq(Dim))
  }

  test("pack_i8 rejects out-of-range values and dot_i8 nulls on " +
      "length mismatch") {
    val e = intercept[Exception] {
      spark.sql("SELECT pack_i8(array(300L))").collect()
    }
    assert(e.getMessage.contains("signed-byte range") ||
      Option(e.getCause).exists(_.getMessage.contains("signed-byte range")))
    val edge = spark.sql(
      """SELECT dot_i8(pack_i8(array(1L,2L)), pack_i8(array(3L))) AS m,
        |  dot_i8(pack_i8(array(1L,2L)), pack_i8(array(3L,4L))) AS n,
        |  pack_i8(array(1L, CAST(NULL AS BIGINT))) AS p"""
        .stripMargin).collect()(0)
    assert(edge.isNullAt(0))
    assert(edge.getLong(1) === 11L)
    assert(edge.isNullAt(2))
  }

  test("dot_long / dot_i8 reject wrong-typed SQL arguments at " +
      "analysis time") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_long('a', array(1L))").collect()
    }
    assert(e1.getMessage.contains("ARRAY<BIGINT>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_i8('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("BINARY"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT pack_i8('a')").collect()
    }
    assert(e3.getMessage.contains("array<bigint>"))
  }

  test("native dot_long matches the interpreted HOF fold and its " +
      "null semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextInt(255).toLong - 127),
      Seq.fill(16)(rnd.nextInt(255).toLong - 127)))
      .toDF("a", "b")
    val both = rows.select(
      expr("dot_long(a, b)").as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .collect()
    assert(both.forall(r => r.getLong(0) === r.getLong(1)))
    // length mismatch and null element -> null, as with zip_with
    val edge = spark.sql(
      """SELECT dot_long(array(1L,2L), array(3L)) AS m,
        |  dot_long(array(1L, CAST(NULL AS BIGINT)), array(3L,4L)) AS n,
        |  dot_long(CAST(NULL AS ARRAY<BIGINT>), array(3L)) AS o"""
        .stripMargin).collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }

  test("recall denominator caps at the exact result size on corpora " +
      "smaller than k") {
    // 4 vectors, k=5: each query has only 3 exact neighbors; a perfect
    // approximation must still score 1.0, not 3/5
    val tiny = corpus.filter(col("vec_id") < 4)
    val qs = tiny.select(col("vec_id").as("query_id"))
    val ex = Similarity.bruteForceTopK(tiny, tiny, K)
    val rec = Similarity.recallAtK(qs, ex, ex, K, "exact")
    assert(rec.count() === 4)
    assert(rec.collect().forall(_.getAs[Double]("recall") === 1.0))
  }

  test("semDedup: drop rule holds and is partitioning-insensitive") {
    val d = corpus // 120 clustered vectors
    val got = Similarity.semDedup(d, "vec_id", "embedding",
      k = 4, dim = Dim, iterations = 2, threshold = 0.95)
    val rows = got.orderBy("vec_id").collect()
    assert(rows.length === d.count())
    // within a tight cluster at tau=0.95 the jittered copies are
    // near-dups: something must drop, but never everything
    val kept = rows.count(_.getAs[Boolean]("kept"))
    assert(kept > 0 && kept < rows.length)
    // every cell retains at least one survivor
    val cells = rows.groupBy(_.getAs[Int]("cell"))
    cells.foreach { case (_, rs) =>
      assert(rs.exists(_.getAs[Boolean]("kept")))
    }
    // a vector with zero near-dups is always kept
    rows.filter(_.getAs[Long]("near_dups") == 0L)
      .foreach(r => assert(r.getAs[Boolean]("kept")))
    val again = Similarity.semDedup(d.repartition(7), "vec_id",
        "embedding", k = 4, dim = Dim, iterations = 2,
        threshold = 0.95)
      .orderBy("vec_id").collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("argmax_cell: ties to lower id, NaN greatest, float payload " +
      "preserved, merge path equals single-partition run") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    def agg(s: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column,
        p: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.expressions.ArgMaxCell(
        ColumnBridge.expression(s), ColumnBridge.expression(i),
        ColumnBridge.expression(p)).toAggregateExpression())
    val rows = Seq(
      ("a", 0.5, 3, Seq(1.0f)), ("a", 0.9, 7, Seq(2.0f)),
      ("a", 0.9, 2, Seq(3.0f)),                    // tie → lower id 2
      ("b", Double.NaN, 9, Seq(4.0f)), ("b", 1.0, 1, Seq(5.0f)),
      ("c", 0.1, 4, Seq(6.0f)))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("g")
      .agg(agg(col("s"), col("i").cast("int"), col("p")).as("b"))
      .select(col("g"), col("b.score"), col("b.cid"), col("b.payload"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getSeq[Float](3).toList)).sortBy(_._1).toList
    val one = run(rows.toDF("g", "s", "i", "p").coalesce(1))
    assert(one(0) === ("a", 0.9, 2, List(3.0f)))
    assert(one(1)._3 === 9 && one(1)._2.isNaN)     // NaN sorts greatest
    assert(one(2) === ("c", 0.1, 4, List(6.0f)))
    // many partitions force serialize/merge; result must be identical
    val many = run(rows.toDF("g", "s", "i", "p").repartition(5))
    assert(many(0) === one(0) && many(2) === one(2))
    assert(many(1)._3 === one(1)._3 && many(1)._2.isNaN)
  }

  test("semDedupTwoLevel: bits2=0 equals flat semDedup exactly") {
    // one bucket per cell means the candidate set IS the within-cell
    // all-pairs set — the two-level form must reproduce the flat
    // tier row for row at the same codebook
    val d = corpus
    val flat = Similarity.semDedup(d, "vec_id", "embedding",
        k = 4, dim = Dim, iterations = 2, threshold = 0.95)
      .orderBy("vec_id").collect()
    val two = Similarity.semDedupTwoLevel(d, "vec_id", "embedding",
        k1 = 4, dim = Dim, iterations = 2, threshold = 0.95,
        bits2 = 0, tables = 3)
      .orderBy("vec_id").collect()
    assert(two.toSeq === flat.toSeq)
  }

  test("semDedupTwoLevel: drop rule, precision, partitioning") {
    val d = corpus
    val got = Similarity.semDedupTwoLevel(d, "vec_id", "embedding",
      k1 = 4, dim = Dim, iterations = 2, threshold = 0.95,
      bits2 = 2, tables = 2)
    val rows = got.orderBy("vec_id").collect()
    assert(rows.length === d.count())
    // splitting only PRUNES candidates: dropped ⊆ flat-dropped (no
    // false positives — every two-level drop has a flat witness),
    // and per-row near_dups never exceeds the flat count
    val flat = Similarity.semDedup(d, "vec_id", "embedding",
        k = 4, dim = Dim, iterations = 2, threshold = 0.95)
      .orderBy("vec_id").collect()
    rows.zip(flat).foreach { case (t, f) =>
      assert(t.getAs[Long]("vec_id") === f.getAs[Long]("vec_id"))
      assert(t.getAs[Int]("cell") === f.getAs[Int]("cell"))
      assert(t.getAs[Long]("near_dups") <= f.getAs[Long]("near_dups"))
      if (!t.getAs[Boolean]("kept"))
        assert(!f.getAs[Boolean]("kept"),
          s"two-level dropped ${t.getAs[Long]("vec_id")} that flat kept")
    }
    // a vector with zero candidate near-dups is always kept
    rows.filter(_.getAs[Long]("near_dups") == 0L)
      .foreach(r => assert(r.getAs[Boolean]("kept")))
    // deterministic under repartitioning
    val again = Similarity.semDedupTwoLevel(d.repartition(7), "vec_id",
        "embedding", k1 = 4, dim = Dim, iterations = 2,
        threshold = 0.95, bits2 = 2, tables = 2)
      .orderBy("vec_id").collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("two-level auto sizing rules: cube-root cells, constant bucket") {
    // k1 = ceil(n^(1/3)) clamped [1, 4096]
    assert(Similarity.autoCoarseCells(0) === 1)
    assert(Similarity.autoCoarseCells(8) === 2)
    assert(Similarity.autoCoarseCells(500) === 8)
    assert(Similarity.autoCoarseCells(1000000) === 100)
    assert(Similarity.autoCoarseCells(Long.MaxValue) === 4096)
    // bits2: smallest width with expected (cell, bucket) <= target;
    // 0 = no split needed
    assert(Similarity.autoResidualBits(500, 8, 32) === 1) // 62.5/cell
    assert(Similarity.autoResidualBits(256, 8, 32) === 0)
    assert(Similarity.autoResidualBits(0, 1, 32) === 0)
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val k1 = Similarity.autoCoarseCells(n)
      val b = Similarity.autoResidualBits(n, k1, 32)
      assert(b === 24 ||
        n.toDouble / k1 / (1L << b) <= 32.0,
        s"n=$n k1=$k1 bits=$b bucket=${n.toDouble / k1 / (1L << b)}")
    }
    // semDedupAuto routes through the two-level form at those sizes
    val d = corpus
    val n = d.count()
    val k1 = Similarity.autoCoarseCells(n)
    val auto = Similarity.semDedupAuto(d, "vec_id", "embedding",
      dim = Dim, threshold = 0.95).orderBy("vec_id").collect()
    val pinned = Similarity.semDedupTwoLevel(d, "vec_id", "embedding",
        k1 = k1, dim = Dim, iterations = 2, threshold = 0.95,
        bits2 = Similarity.autoResidualBits(n, k1, 32))
      .orderBy("vec_id").collect()
    assert(auto.toSeq === pinned.toSeq)
  }

  test("semDedupTwoLevel reuses a persisted IVF coarse quantizer") {
    // the index-once/dedup-free shape: a pipeline that already built
    // an ANN index feeds its stored codebook straight in — zero
    // additional training passes, identical result to training fresh
    // (kmeansCodebook is deterministic)
    val d = corpus
    val idx = tmpDir("ivf-semdedup")
    Similarity.buildIvfIndex(d, idx, k = 4, dim = Dim, iterations = 2)
    val stored = spark.read.parquet(s"$idx/codebook")
    val viaIndex = Similarity.semDedupTwoLevel(d, "vec_id", "embedding",
        k1 = 4, dim = Dim, iterations = 2, threshold = 0.95,
        bits2 = 2, codebook = Some(stored))
      .orderBy("vec_id").collect()
    val trained = Similarity.semDedupTwoLevel(d, "vec_id", "embedding",
        k1 = 4, dim = Dim, iterations = 2, threshold = 0.95, bits2 = 2)
      .orderBy("vec_id").collect()
    assert(viaIndex.toSeq === trained.toSeq)
  }

  test("prototypicality: drops exactly the closest fraction per cell") {
    val got = Similarity.prototypicality(corpus, "vec_id", "embedding",
      k = 4, dim = Dim, iterations = 2, pruneFraction = 0.25)
    val rows = got.orderBy("vec_id").collect()
    assert(rows.length === corpus.count())
    rows.groupBy(_.getAs[Int]("cell")).foreach { case (_, rs) =>
      val size = rs.head.getAs[Long]("cell_size")
      assert(rs.length === size)
      val dropped = rs.filterNot(_.getAs[Boolean]("kept"))
      // exactly floor(0.25*size) dropped, and they are the TOP ranks
      // (the centroid-hugging prototypical members)
      assert(dropped.length === (0.25 * size).toInt)
      assert(dropped.map(_.getAs[Long]("rank_in_cell")).sorted.toSeq ===
        (1L to dropped.length.toLong))
      assert(rs.exists(_.getAs[Boolean]("kept"))) // never empties a cell
    }
    // fraction 0 keeps everything; determinism under repartitioning
    val all = Similarity.prototypicality(corpus, "vec_id", "embedding",
      k = 4, dim = Dim, iterations = 2, pruneFraction = 0.0).collect()
    assert(all.forall(_.getAs[Boolean]("kept")))
    val again = Similarity.prototypicality(corpus.repartition(7),
        "vec_id", "embedding", k = 4, dim = Dim, iterations = 2,
        pruneFraction = 0.25)
      .orderBy("vec_id").collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("clusterLabelAudit: purity recovers the planted clusters") {
    import spark.implicits._
    // ground truth: the corpus is generated from 4 well-separated
    // centers with label = id % 4 — a 4-cell codebook should align
    // almost perfectly with the labels
    val labeled = corpus.withColumn("label",
      pmod(col("vec_id"), lit(4L)).cast("int"))
    val got = Similarity.clusterLabelAudit(labeled, "vec_id",
        "embedding", "label", k = 4, dim = Dim, iterations = 2)
      .orderBy("cell").collect()
    assert(got.map(_.getAs[Long]("cell_size")).sum === 120L)
    got.foreach { r =>
      assert(r.getAs[Double]("purity") >= 0.9,
        s"cell ${r.getAs[Int]("cell")} purity ${r.getAs[Double]("purity")}")
      assert(r.getAs[Long]("majority_count") <=
        r.getAs[Long]("cell_size"))
    }
    // the 4 majority labels are distinct (each cell owns one cluster)
    assert(got.map(_.getAs[Int]("majority_label")).distinct.length === 4)
    // null labels are excluded, not grouped: nulling half the labels
    // halves the audited mass but keeps purity semantics
    val half = corpus.withColumn("label",
      when(pmod(col("vec_id"), lit(2L)) === 0L,
        pmod(col("vec_id"), lit(4L)).cast("int")))
    val g2 = Similarity.clusterLabelAudit(half, "vec_id", "embedding",
      "label", k = 4, dim = Dim, iterations = 2).collect()
    assert(g2.map(_.getAs[Long]("cell_size")).sum === 60L)
  }

  test("semDedup increments compose append-only") {
    import spark.implicits._
    val statePath = tmpDir("semdedup-state")
    val base = corpus.filter(col("vec_id") < 60)
    val built = Similarity.buildSemDedupState(base, "vec_id",
      "embedding", statePath, k1 = 4, dim = Dim, iterations = 2,
      threshold = 0.95, bits2 = 2, tables = 2)
      .orderBy("vec_id").collect()
    // batch B: one exact copy of an old vector (id 1000 = old id 3)
    // plus a far-out vector nothing matches
    val oldVec = base.filter(col("vec_id") === 3)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val farVec = Array.tabulate(Dim)(d => if (d == Dim - 1) 1e6f else 0f)
    val b = Seq((1000L, oldVec), (1001L, farVec))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.semDedupAssignIncrement(spark, statePath, b,
        "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(r1.length === 2)
    // the copy of an old vector drops against the stored corpus
    assert(!r1(0).getAs[Boolean]("kept"))
    assert(r1(0).getAs[Int]("joined_existing") === 1)
    // the far-out vector survives with no neighbors
    assert(r1(1).getAs[Boolean]("kept"))
    assert(r1(1).getAs[Long]("near_dups") === 0L)
    // batch C: a copy of the BATCH-B far-out vector — it must drop
    // against the APPENDED state (proves increments compose), and
    // report having joined an existing cluster
    val c2 = Seq((2000L, farVec)).toDF("vec_id", "embedding")
    val r2 = Similarity.semDedupAssignIncrement(spark, statePath, c2,
        "vec_id", "embedding").collect()
    assert(!r2(0).getAs[Boolean]("kept"))
    assert(r2(0).getAs[Int]("joined_existing") === 1)
    // old verdicts never change: the stored cells still carry the
    // build-time kept flags for every original id
    val stored = spark.read.parquet(s"$statePath/cells")
      .filter(col("vec_id") < 60)
      .select("vec_id", "kept").orderBy("vec_id").collect()
    assert(stored.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      built.map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Boolean]("kept"))).toSeq)
  }

  test("residualSignBucket: fold-difference bits, null parity") {
    import spark.implicits._
    // dim=2, bits=2: check the sign arithmetic directly against the
    // generated hyperplanes
    val signs = Similarity.hyperplaneSigns(2, 2, 42L)
    val rows = Seq(
      (1L, Seq(1.0, 2.0), Seq(0.5, 0.5)),
      (2L, Seq(-3.0, 1.0), Seq(0.0, 0.0)),
      (3L, Seq(1.0, 1.0), Seq(1.0, 1.0))) // zero residual -> all >= 0
    val got = rows.toDF("id", "v", "c")
      .withColumn("rb",
        Similarity.residualSignBucket(col("v"), col("c"), 2, 2, 42L))
      .orderBy("id").collect().map(_.getAs[Int]("rb"))
    def expected(v: Seq[Double], c: Seq[Double]): Int =
      (0 until 2).map { b =>
        val pv = v(0) * signs(b)(0) + v(1) * signs(b)(1)
        val pc = c(0) * signs(b)(0) + c(1) * signs(b)(1)
        if (pv - pc >= 0) 1 << b else 0
      }.sum
    rows.zip(got).foreach { case ((_, v, c), rb) =>
      assert(rb === expected(v, c))
    }
    assert(got(2) === 3) // zero residual: every bit >= 0
    // null array on either side buckets to 0, SignBuckets parity
    val nulls = Seq((1L, Option.empty[Seq[Double]], Some(Seq(1.0, 1.0))),
      (2L, Some(Seq(1.0, 1.0)), Option.empty[Seq[Double]]))
      .toDF("id", "v", "c")
      .withColumn("rb",
        Similarity.residualSignBucket(col("v"), col("c"), 2, 2, 42L))
      .collect().map(_.getAs[Int]("rb"))
    assert(nulls.forall(_ === 0))
  }

  test("semDedup: impossible threshold keeps everything") {
    val d = corpus
    val got = Similarity.semDedup(d, "vec_id", "embedding",
      k = 4, dim = Dim, iterations = 1, threshold = 1.1).collect()
    assert(got.forall(_.getAs[Boolean]("kept")))
    assert(got.forall(_.getAs[Long]("near_dups") === 0L))
  }
}
