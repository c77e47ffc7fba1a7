package graft

import graft.analytics.Sequences

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def gaps(keys: Seq[Long], width: Long) =
    Sequences.idGaps(keys.toDF("k"), "k", bucketWidth = width)
      .orderBy("gap_start")
      .as[(Long, Long, Long)].collect().toSeq

  test("idGaps: within-bucket, cross-bucket, and empty-bucket gaps") {
    // width 10: buckets {0: 1,2}, {1: 17}, {3: 30}
    // gaps: 3..16 (crosses bucket 0->1), 18..29 (spans empty bucket 2)
    val got = gaps(Seq(1L, 2L, 17L, 30L), width = 10)
    assert(got === Seq((3L, 16L, 14L), (18L, 29L, 12L)))
  }

  test("idGaps: dense domain and duplicates yield no gaps") {
    assert(gaps(Seq(5L, 6L, 6L, 7L, 8L), width = 3) === Seq.empty)
  }

  test("idGaps: bucketed result equals the global-lead form") {
    val keys = Seq(1L, 4L, 5L, 9L, 23L, 24L, 40L, 41L, 57L)
    val wide = gaps(keys, width = 1000000) // one bucket = global lead
    val narrow = gaps(keys, width = 5)
    assert(narrow === wide)
    assert(wide.nonEmpty)
  }
}
