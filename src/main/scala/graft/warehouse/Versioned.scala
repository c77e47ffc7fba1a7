package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based table versioning — snapshot isolation and time
  * travel for a parquet lake, the Iceberg/Delta core idea at library
  * size. The reference keeps one mutable PostgreSQL state
  * (`db/init/01-schema.sql`) with no history; a 100 TB lake needs
  * immutable data + named snapshots instead.
  *
  * Layout under `path/`:
  *   - `data/seg-<version>/part-*.parquet` — immutable segment dirs,
  *     one per commit, NEVER rewritten;
  *   - `_versions/v<NNNNN>.list` — one manifest per version: the
  *     newline-separated list of segment dirs LIVE in that snapshot.
  *
  * A commit writes its segment FIRST and publishes the manifest LAST
  * (tmp + atomic rename), so a torn commit leaves an orphan segment
  * that no reader ever sees — readers resolve a manifest, then scan
  * exactly the listed dirs (no directory listing of `data/`, the
  * object-store-scale property: the manifest is the source of truth).
  * Appends reference the parent's segments plus the new one;
  * overwrites reference only the new one. Old versions stay readable
  * until a retention job deletes their manifests and unreferenced
  * segments.
  *
  * Scale shape: manifests are O(commits) lines of text; reads are
  * plain multi-dir parquet scans (column pruning / predicate pushdown
  * / partition parallelism all intact); commit coordination is one
  * atomic rename — no table-wide locks, no data rewrite on append.
  *
  * Concurrency: optimistic single-winner commits — two writers racing
  * to the same version target the same segment dir, so the second
  * segment write fails (`errorifexists`) before any manifest is
  * staged, and the rename-to-existing backstop catches the remaining
  * interleavings on HDFS-semantics filesystems; the loser errors and
  * retries at the next version, any staged debris left as an orphan
  * for [[vacuum]]. Object stores without atomic rename need an
  * external commit lock, same as every manifest-based format.
  */
object Versioned {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_versions")

  private def manifestPath(root: org.apache.hadoop.fs.Path, v: Long) =
    new org.apache.hadoop.fs.Path(manifestDir(root), f"v$v%05d.list")

  /** All committed version numbers, ascending (empty for a fresh
    * path). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (f, root) = fs(spark, path)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      // %05d is a zero-padding MINIMUM: version 100000 renders as
      // v100000.list, so the pattern must accept >5 digits or reads
      // silently pin to v99999 after the 100k-th commit
      .collect { case n if n.matches("v\\d{5,}\\.list") =>
        n.stripPrefix("v").stripSuffix(".list").toLong }
      .sorted
  }

  private def readManifest(f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, v: Long): Seq[String] = {
    val in = f.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `df` as the next version. `overwrite = false` (append)
    * keeps the parent snapshot's segments live; `overwrite = true`
    * makes the new segment the whole table. Returns the new version
    * number. Torn-commit safe: the segment is fully written before the
    * manifest rename publishes it.
    */
  def commit(df: DataFrame, path: String,
      overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    val (f, root) = fs(spark, path)
    val prev = versions(spark, path)
    val v = prev.lastOption.getOrElse(0L) + 1L
    val segRel = f"data/seg-$v%05d"
    df.write.mode("errorifexists").parquet(s"$path/$segRel")
    val live =
      if (overwrite || prev.isEmpty) Seq(segRel)
      else readManifest(f, root, prev.last) :+ segRel
    val tmp = new org.apache.hadoop.fs.Path(
      manifestDir(root), f".v$v%05d.tmp")
    val out = f.create(tmp, true)
    try out.write((live.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, manifestPath(root, v)))
      sys.error(s"Versioned.commit: publish rename failed for v$v")
    v
  }

  /** Retention: keep the last `keepLast` versions, delete older
    * manifests and every segment no retained manifest references
    * (orphans from torn commits go too). Returns (manifests deleted,
    * segments deleted). Readers of retained versions are unaffected —
    * their manifests and segments survive verbatim; this is the
    * vacuum side of the snapshot contract, run as a maintenance job.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int)
      : (Int, Int) = {
    require(keepLast >= 1, "Versioned.vacuum: keepLast must be >= 1")
    val (f, root) = fs(spark, path)
    val vs = versions(spark, path)
    val keep = vs.takeRight(keepLast).toSet
    val live = vs.filter(keep)
      .flatMap(v => readManifest(f, root, v)).toSet
    val dropManifests = vs.filterNot(keep)
    dropManifests.foreach(v => f.delete(manifestPath(root, v), false))
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    val dropSegs =
      if (!f.exists(dataDir)) Seq.empty[org.apache.hadoop.fs.Path]
      else f.listStatus(dataDir).toSeq.map(_.getPath)
        .filterNot(p => live.contains(s"data/${p.getName}"))
    dropSegs.foreach(p => f.delete(p, true))
    (dropManifests.size, dropSegs.size)
  }

  /** Compaction: rewrite the LATEST snapshot as one fresh segment and
    * commit it as an overwrite version — the small-segments cure for
    * an append-heavy table (manifests otherwise accumulate one
    * segment per micro-batch/commit and readers pay per-dir open
    * costs). History is preserved: older versions still reference the
    * original segments until [[vacuum]] retires them. Returns the new
    * version. Optionally coalesces to `numFiles` output files.
    */
  def compact(spark: SparkSession, path: String,
      numFiles: Option[Int] = None): Long = {
    val latest = read(spark, path)
    val df = numFiles.map(latest.coalesce).getOrElse(latest)
    commit(df, path, overwrite = true)
  }

  /** Snapshot read — the given version, or the latest when
    * unspecified. Fails with a named error on an unknown version
    * instead of an empty scan. */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val (f, root) = fs(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"Versioned.read: no committed versions at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"Versioned.read: version $v not in ${vs.mkString(",")} at $path")
    val segs = readManifest(f, root, v).map(rel => s"$path/$rel")
    spark.read.parquet(segs: _*)
  }
}
