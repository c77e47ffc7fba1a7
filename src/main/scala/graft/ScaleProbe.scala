package graft

import org.apache.spark.sql.SparkSession

/** Parameterized micro-probe for scale-knob experiments that the
  * fixed-parameter bench queries cannot express — e.g. how semantic
  * dedup behaves as the cluster count k tracks corpus size (the
  * Σ|cell|² term is quadratic in cell size, so k must grow ≈ √n; the
  * oracled q103 pins k=8 for the DuckDB replay).
  *
  * Usage: runMain graft.ScaleProbe semdedup <sfDir> <k> [threshold]
  * Prints one line: op, params, result row count, wall seconds.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions",
        "graft.expressions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.path("warehouse"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "semdedup" :: sfDir :: k :: rest =>
        val tau = rest.headOption.map(_.toDouble).getOrElse(0.35)
        val emb = Tables.load(spark, sfDir, "embeddings")
        val dim = 64
        // one untimed warmup pass over the scan so the probe measures
        // the operator, not parquet footer reads / JIT
        emb.count(): Unit
        val t0 = System.nanoTime()
        val n = graft.analytics.Similarity.semDedup(
          emb, "vec_id", "embedding", k = k.toInt, dim = dim,
          iterations = 2, threshold = tau).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"semdedup","sf":"$sfDir","k":${k.toInt},""" +
          f""""threshold":$tau,"rows":$n,"sec":$sec%.3f}""")
      case "kmeans" :: sfDir :: k :: _ =>
        val emb = Tables.load(spark, sfDir, "embeddings")
        emb.count(): Unit
        val t0 = System.nanoTime()
        val cb = graft.analytics.Similarity.kmeansCodebook(
          emb, "vec_id", "embedding", k.toInt, 64, 2)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"kmeans","k":${k.toInt},""" +
          f""""rows":${cb.count()},"sec":$sec%.3f}""")
      case "semcells" :: sfDir :: k :: _ =>
        // cell-size distribution after training — diagnoses whether
        // Σ|cell|² (the pairwise term) actually shrinks with k
        import org.apache.spark.sql.functions._
        val emb = Tables.load(spark, sfDir, "embeddings")
        val cb = graft.analytics.Similarity.kmeansCodebook(
          emb, "vec_id", "embedding", k.toInt, 64, 2)
        val sizes = emb.crossJoin(broadcast(cb))
          .withColumn("cs", graft.analytics.Similarity.cosine(
            col("embedding"), col("cent_emb")))
          .groupBy("vec_id")
          .agg(max(struct(col("cs"),
            (-col("centroid_id")).as("nc"))).as("b"))
          .select((-col("b.nc")).as("cell"))
          .groupBy("cell").count()
          .orderBy(col("count").desc)
          .collect()
        val tot = sizes.map(_.getLong(1)).sum
        val sq = sizes.map(r => r.getLong(1) * r.getLong(1)).sum
        println(s"""{"probe":"semcells","k":${k.toInt},"cells":${sizes.length},""" +
          s""""top":${sizes.take(5).map(_.getLong(1)).mkString("[", ",", "]")},""" +
          s""""n":$tot,"sumSq":$sq}""")
      case other =>
        System.err.println(s"unknown probe args: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
