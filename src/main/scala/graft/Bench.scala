package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries execute into
  * the `noop` sink so the whole plan (including projections that a
  * bare count() would prune away) runs end-to-end without sink I/O.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) after an
  * untimed warmup; the JSON carries the per-query MEDIAN, taming the
  * 20-30% JIT/page-cache run-to-run variance so round-over-round
  * regressions are attributable. A query that throws is listed in
  * `failed` with time -1 (excluded from the total) and the process
  * exits non-zero — a failure can never read as a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-footer paths, one cheap
    // query per table family
    for (w <- Seq("q01_pricing_summary", "q13_completeness",
        "q12_doc_token_stats", "q37_media_stats"))
      try SparkEntry.queries.get(w)
        .foreach(_(spark, sfDir).write.format("noop").mode("overwrite")
          .save())
      catch { case _: Throwable => }
    val only = SparkEntry.nameFilter()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only(n) }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    val failed = scala.collection.mutable.SortedSet[String]()
    for (r <- 1 to runs) {
      // drop persisted frames from the previous pass: operators that
      // persist internally (dedup indexes/results) would otherwise be
      // plan-cache hits on runs 2+ and the median would report cached
      // reads instead of cold compute
      spark.catalog.clearCache()
      for ((name, fn) <- names) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times(name) = ((System.nanoTime() - t0) / 1e9) ::
            times.getOrElse(name, Nil)
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name run $r failed: ${e.getMessage}")
        }
      }
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a query that failed ANY run reports -1 and never contributes to
    // the total — mixed-run medians would make flaky queries
    // incomparable across rounds
    val qs = names.map { case (n, _) =>
      n -> (if (failed.contains(n)) -1.0
        else times.get(n).filter(_.nonEmpty).map(median).getOrElse(-1.0))
    }
    val total = qs.collect { case (_, t) if t >= 0 => t }.sum
    val qJson = qs.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir","runs":$runs,"failed":$fJson}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
