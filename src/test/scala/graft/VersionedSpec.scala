package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Versioned

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("append/overwrite lineage and time travel") {
    val path = tmpDir("vtt") + "/t"
    val v1 = Versioned.commit(Seq(1, 2).toDF("x"), path)
    val v2 = Versioned.commit(Seq(3).toDF("x"), path)
    val v3 = Versioned.commit(Seq(9).toDF("x"), path, overwrite = true)
    assert((v1, v2, v3) === (1L, 2L, 3L))
    assert(Versioned.versions(spark, path) === Seq(1L, 2L, 3L))
    def xs(v: Long) = Versioned.read(spark, path, Some(v))
      .as[Int].collect().sorted.toSeq
    assert(xs(1) === Seq(1, 2))
    assert(xs(2) === Seq(1, 2, 3)) // append keeps parent segments
    assert(xs(3) === Seq(9))       // overwrite replaces the table
    // latest = v3; old snapshots still readable after the overwrite
    assert(Versioned.read(spark, path).as[Int].collect().toSeq === Seq(9))
    assert(xs(2) === Seq(1, 2, 3))
  }

  test("a torn commit (segment without manifest) is invisible") {
    val path = tmpDir("vtorn") + "/t"
    Versioned.commit(Seq(1).toDF("x"), path): Unit
    // simulate a crash between segment write and manifest publish
    Seq(99).toDF("x").write.parquet(s"$path/data/seg-zzzzz")
    assert(Versioned.versions(spark, path) === Seq(1L))
    assert(Versioned.read(spark, path).as[Int].collect().toSeq === Seq(1))
    // the next commit continues the lineage past the orphan
    Versioned.commit(Seq(2).toDF("x"), path): Unit
    assert(Versioned.read(spark, path)
      .as[Int].collect().sorted.toSeq === Seq(1, 2))
  }

  test("unknown version and empty table fail with named errors") {
    val path = tmpDir("vempty") + "/t"
    val e1 = intercept[IllegalArgumentException] {
      Versioned.read(spark, path)
    }
    assert(e1.getMessage.contains("no committed versions"))
    Versioned.commit(Seq(1).toDF("x"), path): Unit
    val e2 = intercept[IllegalArgumentException] {
      Versioned.read(spark, path, Some(7L))
    }
    assert(e2.getMessage.contains("version 7 not in"))
  }

  test("vacuum keeps the retained snapshots intact, drops the rest") {
    val path = tmpDir("vvac") + "/t"
    Versioned.commit(Seq(1).toDF("x"), path): Unit           // v1
    Versioned.commit(Seq(2).toDF("x"), path): Unit           // v2
    Versioned.commit(Seq(9).toDF("x"), path, overwrite = true) // v3
    // orphan segment from a simulated torn commit — vacuum sweeps it
    Seq(99).toDF("x").write.parquet(s"$path/data/seg-zzzzz")
    val (m, s) = Versioned.vacuum(spark, path, keepLast = 1)
    // v1/v2 manifests dropped; seg-1/seg-2 (unreferenced by v3) and
    // the orphan dropped; v3 reads exactly as before
    assert((m, s) === (2, 3))
    assert(Versioned.versions(spark, path) === Seq(3L))
    assert(Versioned.read(spark, path).as[Int].collect().toSeq === Seq(9))
    intercept[IllegalArgumentException] {
      Versioned.read(spark, path, Some(2L))
    }
  }

  test("vacuum retains shared segments an older live version needs") {
    val path = tmpDir("vvac2") + "/t"
    Versioned.commit(Seq(1).toDF("x"), path): Unit // v1
    Versioned.commit(Seq(2).toDF("x"), path): Unit // v2 = seg1+seg2
    Versioned.commit(Seq(3).toDF("x"), path): Unit // v3 = seg1+seg2+seg3
    val (m, s) = Versioned.vacuum(spark, path, keepLast = 2)
    assert((m, s) === (1, 0)) // seg-1 is still referenced by v2 and v3
    assert(Versioned.read(spark, path, Some(2L))
      .as[Int].collect().sorted.toSeq === Seq(1, 2))
    assert(Versioned.read(spark, path, Some(3L))
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("compact rewrites latest as one segment, history preserved") {
    val path = tmpDir("vcomp") + "/t"
    Versioned.commit(Seq(1).toDF("x"), path): Unit
    Versioned.commit(Seq(2).toDF("x"), path): Unit
    Versioned.commit(Seq(3).toDF("x"), path): Unit
    val v = Versioned.compact(spark, path, numFiles = Some(1))
    assert(v === 4L)
    // same data, one segment; pre-compaction snapshots intact
    assert(Versioned.read(spark, path)
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(Versioned.read(spark, path, Some(2L))
      .as[Int].collect().sorted.toSeq === Seq(1, 2))
    // vacuum after compaction retires the three original segments
    val (m, s) = Versioned.vacuum(spark, path, keepLast = 1)
    assert((m, s) === (3, 3))
    assert(Versioned.read(spark, path)
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("snapshot isolation: a reader plan resolved at v1 is unaffected " +
      "by a later commit") {
    val path = tmpDir("viso") + "/t"
    Versioned.commit(Seq(1).toDF("x"), path): Unit
    val snap = Versioned.read(spark, path, Some(1L))
    Versioned.commit(Seq(2).toDF("x"), path): Unit
    assert(snap.as[Int].collect().toSeq === Seq(1))
  }
}
