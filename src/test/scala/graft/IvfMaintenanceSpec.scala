package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Similarity

/** Concurrency hardening of the persisted IVF index (round-19 brief
  * #2): interleaved appends must merge stats correctly (the pre-r19
  * read-merge-overwrite lost one appender's update), a legacy
  * (pre-stats) index must not double-count an appended batch, and a
  * reader must never observe a mixed codebook/cells/cellstats trio
  * across a [[Similarity.rebuildIvfIndex]] generation swap.
  */
class IvfMaintenanceSpec extends SparkSpec {

  private val Dim = 16

  private def mkCorpus(ids: Range, clusterOf: Long => Int): DataFrame = {
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array.tabulate(Dim)(_ => 1.0f),
      Array.tabulate(Dim)(i => if (i < 8) -1.0f else 1.0f),
      Array.tabulate(Dim)(i => if (i % 2 == 0) 1.0f else -1.0f),
      Array.tabulate(Dim)(i => if (i % 2 == 0) -1.0f else 1.0f))
    val rows = ids.map { i =>
      val id = i.toLong
      val c = centers(clusterOf(id))
      (id, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def statsMap(dir: String): Map[Int, (Long, Double)] =
    Similarity.readCellStats(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  /** Ground-truth per-cell stats: re-assign EVERYTHING in the cells
    * table against the stored codebook and aggregate directly. */
  private def truthMap(dir: String): Map[Int, (Long, Double)] = {
    val d = Similarity.resolveIndexDir(spark, dir)
    val cb = spark.read.parquet(s"$d/codebook")
    Similarity.assignNearestCellScored(cb,
        spark.read.parquet(s"$d/cells").select("neighbor_id", "c_emb"),
        "neighbor_id", "c_emb")
      .select(col("cell"), nanvl(col("cscore"), lit(-1.0)).as("cs"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), min("cs").as("m"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
  }

  test("concurrent appends commute: no lost stats update, all " +
      "vectors land, merged stats equal a direct recompute") {
    val dir = tmpDir("ivf-conc")
    Similarity.buildIvfIndex(mkCorpus(0 until 120, id => (id % 4).toInt), dir,
      k = 4, dim = Dim, iterations = 2)
    // two appenders, disjoint batches, truly interleaved — under the
    // pre-r19 read-merge-overwrite one of these folds was lost
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val batches = Seq(
      mkCorpus(1000 until 1060, id => (id % 2).toInt),
      mkCorpus(2000 until 2060, id => 2 + (id % 2).toInt))
    val fs = batches.map(b => Future(Similarity.appendToIvfIndex(b, dir)))
    fs.foreach(Await.result(_, 120.seconds))
    val st = statsMap(dir)
    assert(st.values.map(_._1).sum === 240L,
      s"stats lost an append: $st")
    assert(st === truthMap(dir))
    // both appended populations are queryable through the index
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() === 240L)
    assert(cells.filter(col("neighbor_id") >= 2000L).count() === 60L)
    // a third (sequential) append folds on top of the deltas
    Similarity.appendToIvfIndex(mkCorpus(3000 until 3030, _ => 0), dir)
    assert(statsMap(dir).values.map(_._1).sum === 270L)
    assert(statsMap(dir) === truthMap(dir))
    // and the skew statistic reads the folded view
    val skew = Similarity.ivfCellSkew(spark, dir)
    assert(skew >= 1.0 && skew.isFinite)
  }

  test("legacy pre-stats index: append then readCellStats counts the " +
      "batch ONCE (the r18 double-count regression)") {
    val dir = tmpDir("ivf-legacy")
    Similarity.buildIvfIndex(mkCorpus(0 until 120, id => (id % 4).toInt), dir,
      k = 4, dim = Dim, iterations = 2)
    // simulate an index built before stats existed
    val p = new org.apache.hadoop.fs.Path(s"$dir/cellstats")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true): Unit
    Similarity.appendToIvfIndex(mkCorpus(500 until 560, id => (id % 4).toInt), dir)
    // the fallback scans the cells table (which already contains the
    // batch) and must IGNORE the batch's delta dir — 180, never 240
    val st = statsMap(dir)
    assert(st.values.map(_._1).sum === 180L,
      s"legacy fallback double-counted the appended batch: $st")
    assert(st === truthMap(dir))
  }

  test("generation swap: a pre-rebuild reader keeps a consistent " +
      "frozen trio; post-rebuild resolution is the new trio; a " +
      "second rebuild retains the previous generation") {
    val dir = tmpDir("ivf-gen")
    Similarity.buildIvfIndex(mkCorpus(0 until 120, id => (id % 4).toInt), dir,
      k = 4, dim = Dim, iterations = 2)
    val flat = Similarity.resolveIndexDir(spark, dir)
    assert(flat === dir) // never rebuilt: flat legacy layout
    // a reader resolves the trio BEFORE the rebuild (plan only)
    val preReader = spark.read.parquet(s"$flat/cells")
      .select("neighbor_id")
    Similarity.rebuildIvfIndex(spark, dir, dim = Dim)
    val gen1 = Similarity.resolveIndexDir(spark, dir)
    assert((gen1 !== dir) && gen1.contains("/gen-"))
    // the pre-rebuild reader's files still exist — its scan completes
    assert(preReader.count() === 120L)
    // the new generation is a full consistent trio
    for (t <- Seq("codebook", "cells", "cellstats")) {
      val tp = new org.apache.hadoop.fs.Path(s"$gen1/$t")
      val f = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(f.exists(tp), s"generation missing $t")
    }
    assert(statsMap(dir).values.map(_._1).sum === 120L)
    // queries through the public surface read the new generation and
    // agree with an inline rebuild over the same vectors
    val q = mkCorpus(0 until 4, id => (id % 4).toInt)
    val inlineCb = Similarity.kmeansCodebook(
      spark.read.parquet(s"$gen1/cells")
        .select(col("neighbor_id").as("vec_id"),
          col("c_emb").as("embedding")),
      "vec_id", "embedding", Similarity.autoNlist(120L), Dim, 2,
      initSmallestK = true)
    def rows(df: DataFrame) = df.orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(Similarity.ivfTopKIndexed(spark, dir, q, k = 5,
        nprobe = 2))
      === rows(Similarity.ivfTopKWith(q,
        spark.read.parquet(s"$gen1/cells")
          .select(col("neighbor_id").as("vec_id"),
            col("c_emb").as("embedding")),
        inlineCb, k = 5, nprobe = 2)))
    // second rebuild: gen-1 must SURVIVE (retire keeps 2) so a reader
    // that resolved it just before the publish can finish
    Similarity.rebuildIvfIndex(spark, dir, dim = Dim)
    val gen2 = Similarity.resolveIndexDir(spark, dir)
    assert(gen2 !== gen1)
    val g1p = new org.apache.hadoop.fs.Path(s"$gen1/cells")
    val fg = g1p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fg.exists(g1p), "previous generation retired too early")
    // third rebuild: the OLDEST generation (gen-1) is retired
    Similarity.rebuildIvfIndex(spark, dir, dim = Dim)
    assert(!fg.exists(g1p), "retire(keepLast=2) left 3 generations")
    assert(fg.exists(new org.apache.hadoop.fs.Path(s"$gen2/cells")))
    // appends after a swap land in the CURRENT generation
    Similarity.appendToIvfIndex(mkCorpus(900 until 930, id => (id % 4).toInt), dir)
    assert(statsMap(dir).values.map(_._1).sum === 150L)
    assert(statsMap(dir) === truthMap(dir))
  }

  test("ivfRadiusStats exposes codebook granularity: enough cells " +
      "for the cluster structure gives tight radii, fewer cells " +
      "than clusters collapses them") {
    // the r19 clustered-rehearsal rule at spec size: when the
    // codebook has at least as many cells as the corpus has natural
    // clusters, every cell is one tight cluster (p50 min_cscore near
    // 1 — pruning has teeth); with FEWER cells than clusters each
    // cell must merge near-orthogonal clusters and the p50 radius
    // blows toward 90° (min_cscore toward cos 45-90°) — the
    // statistic a maintainer reads before trusting the pruned
    // decontamination tier
    val corpus = mkCorpus(0 until 120, id => (id / 30).toInt)
    def p50(k: Int): Double = {
      val dir = tmpDir(s"ivf-rad-$k")
      val cb = Similarity.kmeansCodebook(corpus, "vec_id", "embedding",
        k, Dim, 2, initHashK = true)
      Similarity.buildIvfIndex(corpus, dir, k = k, dim = Dim,
        iterations = 2, codebook = Some(cb))
      val r = Similarity.ivfRadiusStats(spark, dir).collect()(0)
      assert(r.getLong(0) >= 2L) // occupied cells
      r.getDouble(2) // p50_cscore
    }
    val tight = p50(4)   // cells == clusters
    val merged = p50(2)  // cells < clusters: forced merges
    assert(tight > 0.9, s"cluster-resolving p50 cscore $tight")
    assert(merged < 0.85, s"merged-cell p50 cscore $merged")
    assert(tight > merged + 0.1,
      s"granularity must separate the stats: $tight vs $merged")
  }

  test("vacuumOrphans sweeps only UNPOINTED gen dirs past the age " +
      "window; pointed generations and young stages survive") {
    import graft.warehouse.IndexGen
    val dir = tmpDir("ivf-orphan")
    Similarity.buildIvfIndex(mkCorpus(0 until 120, id => (id % 4).toInt),
      dir, k = 4, dim = Dim, iterations = 2)
    Similarity.rebuildIvfIndex(spark, dir, dim = Dim)
    val cur = Similarity.resolveIndexDir(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed retrain: staged gen dir, no pointer — one OLD (aged
    // past the window) and one YOUNG (a retrain possibly mid-stage)
    val oldOrphan = new org.apache.hadoop.fs.Path(root, "gen-deadcafe")
    val youngOrphan = new org.apache.hadoop.fs.Path(root, "gen-00beef00")
    f.mkdirs(oldOrphan): Unit
    f.mkdirs(youngOrphan): Unit
    f.setTimes(oldOrphan, System.currentTimeMillis() - 7200L * 1000L,
      -1L)
    val swept = IndexGen.vacuumOrphans(spark, dir,
      minAgeMs = 3600L * 1000L)
    assert(swept === 1)
    assert(!f.exists(oldOrphan))
    assert(f.exists(youngOrphan), "young stage must survive the sweep")
    // the pointed current generation is untouched and still answers
    assert(f.exists(new org.apache.hadoop.fs.Path(cur)))
    assert(Similarity.readCellStats(spark, dir).collect()
      .map(_.getLong(1)).sum === 120L)
    // the unguarded mode is refused outright
    val e = intercept[IllegalArgumentException] {
      IndexGen.vacuumOrphans(spark, dir, minAgeMs = 0L)
    }
    assert(e.getMessage.contains("minAgeMs"))
  }
}
