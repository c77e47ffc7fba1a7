package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based table versioning — snapshot isolation and time
  * travel for a parquet lake, the Iceberg/Delta core idea at library
  * size. The reference keeps one mutable PostgreSQL state
  * (`db/init/01-schema.sql`) with no history; a 100 TB lake needs
  * immutable data + named snapshots instead.
  *
  * Layout under `path/`:
  *   - `data/seg-<version>-<nonce>/part-*.parquet` — immutable
  *     segment dirs, one per commit ATTEMPT (the nonce makes staging
  *     writer-unique, so concurrent committers never share a
  *     directory), NEVER rewritten;
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
  * Concurrency: optimistic single-winner commits with bounded CAS
  * retry — every attempt stages under writer-unique names, the
  * manifest rename (verified by read-back) is the sole arbiter of a
  * version, and the loser automatically retries against the re-read
  * latest ([[commit]]). Object stores without atomic rename need an
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

  /** Segment dirs LIVE in a snapshot (the given version, or latest),
    * as path-relative strings in manifest order. */
  def segments(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[String] = {
    val (f, root) = fs(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty,
      s"Versioned.segments: no committed versions at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"Versioned.segments: version $v not in ${vs.mkString(",")}")
    readManifest(f, root, v)
  }

  /** (segment dir, total bytes) for every segment live in a snapshot
    * — the sizing input for [[compact]]'s small-segment threshold. */
  def segmentBytes(spark: SparkSession, path: String,
      version: Option[Long] = None): Seq[(String, Long)] = {
    val (f, root) = fs(spark, path)
    segments(spark, path, version).map { rel =>
      rel -> f.getContentSummary(
        new org.apache.hadoop.fs.Path(root, rel)).getLength
    }
  }

  /** An 8-hex writer nonce — staged artifacts (segment dirs, tmp
    * manifests) embed it so concurrent writers NEVER share a staging
    * path; the only contended name is the manifest itself. */
  private def nonce(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Try to claim version `v` by publishing `live` as its manifest:
    * stage to a writer-unique tmp, rename onto the manifest path, and
    * READ BACK to verify the claim survived (rename refuses an
    * existing destination on HDFS semantics; the read-back closes the
    * residual local-FS window where two renames race an exists
    * check). Returns false — leaving no manifest debris — when
    * another writer won the version. */
  private def tryPublish(f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, v: Long,
      live: Seq[String]): Boolean = {
    val tmp = new org.apache.hadoop.fs.Path(
      manifestDir(root), f".v$v%05d-${nonce()}.tmp")
    val out = f.create(tmp, true)
    try out.write((live.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val renamed =
      try f.rename(tmp, manifestPath(root, v))
      catch { case _: java.io.IOException => false }
    if (!renamed) { f.delete(tmp, false); return false }
    try readManifest(f, root, v) == live.toList
    catch { case _: java.io.IOException => false }
  }

  /** Commit `df` as the next version. `overwrite = false` (append)
    * keeps the parent snapshot's segments live; `overwrite = true`
    * makes the new segment the whole table. Returns the new version
    * number. Torn-commit safe: the segment is fully written before the
    * manifest rename publishes it.
    *
    * Optimistic concurrency (bounded CAS retry, the protocol of every
    * manifest-based table format): each attempt stages its segment
    * under a WRITER-UNIQUE name (`seg-<v>-<nonce>` — concurrent
    * writers can never interleave inside one directory), then claims
    * the version with one manifest rename, verified by read-back
    * ([[tryPublish]]). Losing the claim costs the attempt's segment
    * write — it becomes an orphan [[vacuum]] collects — and the
    * writer retries against the re-read latest version, up to
    * `maxRetries` times before failing loudly. Versions therefore
    * serialize: every successful commit's parent is exactly the
    * manifest it extended.
    */
  def commit(df: DataFrame, path: String,
      overwrite: Boolean = false, maxRetries: Int = 5): Long = {
    val spark = df.sparkSession
    val (f, root) = fs(spark, path)
    var attempt = 0
    while (true) {
      val prev = versions(spark, path)
      val v = prev.lastOption.getOrElse(0L) + 1L
      val segRel = f"data/seg-$v%05d-${nonce()}"
      df.write.mode("errorifexists").parquet(s"$path/$segRel")
      val live =
        if (overwrite || prev.isEmpty) Seq(segRel)
        else readManifest(f, root, prev.last) :+ segRel
      if (tryPublish(f, root, v, live)) return v
      attempt += 1
      if (attempt > maxRetries)
        sys.error(s"Versioned.commit: lost $maxRetries CAS retries " +
          s"at $path - staged segments are orphans for vacuum")
      // brief backoff so the winner's manifest lands before re-read
      Thread.sleep(20L * attempt)
    }
    sys.error("unreachable")
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

  /** Segment-selective compaction (the Delta/Iceberg OPTIMIZE
    * binpack): rewrite only the latest snapshot's segments SMALLER
    * than `smallerThanBytes` into one fresh packed segment
    * (`numFiles` output files, default 1) and commit a manifest
    * listing (big segments ∪ packed) — large segments are carried BY
    * REFERENCE, never read and never rewritten, so the maintenance
    * cost of an append-heavy 100 TB table is proportional to the
    * small-file debris, not the table. The small-segments cure:
    * micro-batch sinks ([[graft.streaming.EventStreams]]
    * `versionedSink`) accumulate one segment per commit and readers
    * pay per-dir open costs. History is preserved: older versions
    * still reference the original segments until [[vacuum]] retires
    * them. No-op (returns the current version) when fewer than two
    * segments qualify. The default threshold (`Long.MaxValue`) packs
    * the whole snapshot — the legacy full rewrite, which then skips
    * the coalesce when `numFiles` is unset to keep write parallelism.
    * Returns the (possibly unchanged) latest version.
    */
  def compact(spark: SparkSession, path: String,
      numFiles: Option[Int] = None,
      smallerThanBytes: Long = Long.MaxValue): Long = {
    val sized = segmentBytes(spark, path)
    val (small, big) = sized.partition(_._2 < smallerThanBytes)
    val latest = versions(spark, path).last
    // selective mode: binpacking fewer than two small segments is a
    // pure rewrite with no fan-in - skip it
    if (smallerThanBytes != Long.MaxValue && small.size < 2)
      return latest
    val smallDf = spark.read.parquet(
      small.map { case (rel, _) => s"$path/$rel" }: _*)
    val packed =
      if (numFiles.isEmpty && big.isEmpty && smallerThanBytes == Long.MaxValue)
        smallDf // legacy full rewrite: keep natural parallelism
      else smallDf.coalesce(numFiles.getOrElse(1))
    val (f, root) = fs(spark, path)
    val v = latest + 1L
    val segRel = f"data/seg-$v%05d-${nonce()}"
    packed.write.mode("errorifexists").parquet(s"$path/$segRel")
    // compaction does NOT retry a lost claim: a concurrent append
    // means the snapshot this binpack was computed from is stale —
    // the caller's next maintenance run re-plans against fresh sizes
    if (!tryPublish(f, root, v, big.map(_._1) :+ segRel))
      sys.error(s"Versioned.compact: lost the claim for v$v to a " +
        "concurrent commit - rerun compaction (staged segment is an " +
        "orphan for vacuum)")
    v
  }

  /** The APPEND DELTA of a version: only the segments `version` added
    * over its predecessor (all of them for the first version) — the
    * incremental-view-maintenance input: refreshing a view by folding
    * `agg(readDelta(v))` per commit costs ∝ delta, never rescanning
    * old segments. Append-only semantics: an overwrite commit's delta
    * is its new segment (the retraction of the dropped segments is
    * NOT represented — IVM over overwrites needs a snapshot diff,
    * [[graft.warehouse.Snapshot.corpusDiff]]'s job).
    */
  def readDelta(spark: SparkSession, path: String, version: Long)
      : DataFrame = {
    val vs = versions(spark, path)
    require(vs.contains(version),
      s"Versioned.readDelta: version $version not in ${vs.mkString(",")}")
    val cur = segments(spark, path, Some(version))
    val prevSegs = vs.takeWhile(_ < version).lastOption
      .map(p => segments(spark, path, Some(p)).toSet)
      .getOrElse(Set.empty[String])
    val added = cur.filterNot(prevSegs)
    require(added.nonEmpty,
      s"Versioned.readDelta: version $version added no segments")
    spark.read.parquet(added.map(rel => s"$path/$rel"): _*)
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
