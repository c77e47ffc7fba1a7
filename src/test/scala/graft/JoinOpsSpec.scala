package graft

import org.apache.spark.sql.functions._
import graft.analytics.JoinOps
import graft.expressions.BloomSet

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("BloomSet: no false negatives, fpr near target") {
    val (words, k) = BloomSet.params(10000L, 0.01)
    val arr = new Array[Long](words)
    val rnd = new scala.util.Random(7)
    val members = Array.fill(10000)(rnd.nextLong())
    members.foreach(h => BloomSet.insert(arr, k, h))
    val set = new BloomSet(arr, k)
    assert(members.forall(h => BloomSet.contains(set, h)))
    val memberSet = members.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(20000).toArray
    val fp = probes.count(h => BloomSet.contains(set, h))
    val fpr = fp.toDouble / probes.length
    assert(fpr < 0.03, s"false-positive rate $fpr way over the 1% target")
  }

  test("bloomProbe: distributed build finds every key, filters most others") {
    val dim = (0L until 2000L).map(i => i * 3L).toDF("k").repartition(5)
    val bloom = JoinOps.buildKeyBloom(dim, col("k"), 2000L, 0.01)
    val probed = (0L until 6000L).toDF("k")
      .where(JoinOps.bloomProbe(col("k"), bloom))
      .as[Long].collect().toSet
    // every true member survives the filter
    assert((0L until 2000L).map(_ * 3L).forall(probed.contains))
    // false positives are bounded: 2000 members + fpp slack over 4000
    assert(probed.size < 2300, s"bloom passed ${probed.size} of 6000")
  }

  test("bloomProbe drops null keys even when the filter contains hash 42") {
    val dim = Seq(1L, 2L).toDF("k")
    val bloom = JoinOps.buildKeyBloom(dim, col("k"), 2L, 0.01)
    val got = Seq(Some(1L), None, Some(99L)).toDF("k")
      .where(JoinOps.bloomProbe(col("k"), bloom))
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(1L) && !got.contains(99L))
    assert(!got.contains(0L)) // the null row must not leak through
    // adversarial filter: xxhash64(NULL) is the seed constant 42, so
    // a filter that CONTAINS 42 would pass null rows but for the
    // explicit null guard in bloomProbe
    val (words, kk) = BloomSet.params(4L, 0.01)
    val arr = new Array[Long](words)
    BloomSet.insert(arr, kk, 42L)
    val rigged = spark.sparkContext.broadcast(new BloomSet(arr, kk))
    assert(BloomSet.contains(rigged.value, 42L))
    val leaked = Seq(Option.empty[java.lang.Long]).toDF("k")
      .where(JoinOps.bloomProbe(col("k"), rigged))
      .count()
    assert(leaked === 0L)
  }

  test("bloomReduceJoin is row-identical to the plain join") {
    val fact = (0L until 5000L).map(i => (i % 700L, i)).toDF("fk", "payload")
    val dim = (0L until 700L).filter(_ % 7 == 0)
      .map(i => (i, s"d$i")).toDF("dk", "name")
    val reduced = JoinOps.bloomReduceJoin(fact, dim,
        col("fk"), col("dk"), expectedDimKeys = 100L)
      .select("fk", "payload", "name")
      .orderBy("payload").collect().toSeq
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name")
      .orderBy("payload").collect().toSeq
    assert(reduced === plain)
    assert(plain.nonEmpty)
  }

  test("saltedInnerJoin matches the plain join incl. duplicate keys both sides") {
    // skewed big side: key 1 carries most rows; small side has a
    // duplicate key so replication must not double-count matches
    val big = ((0 until 400).map(i => (1L, s"b$i")) ++
      Seq((2L, "x"), (3L, "y"), (5L, "never"))).toDF("k", "bval")
    val small = Seq((1L, "s1a"), (1L, "s1b"), (2L, "s2"), (4L, "s4"))
      .toDF("k", "sval")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "bval", "sval").orderBy("k", "bval", "sval")
        .collect().toSeq
    val salted = canon(
      graft.warehouse.SkewJoin.saltedInnerJoin(big, small, Seq("k"), 8))
    val plain = canon(big.join(small, Seq("k")))
    assert(salted === plain)
    assert(plain.length === 400 * 2 + 1)
  }

  test("saltedInnerJoin is partitioning-insensitive") {
    val big = (0L until 300L).map(i => (i % 5L, i)).toDF("k", "v")
    val small = (0L until 5L).map(i => (i, s"s$i")).toDF("k", "name")
    def run(b: org.apache.spark.sql.DataFrame) =
      graft.warehouse.SkewJoin.saltedInnerJoin(b, small, Seq("k"), 4)
        .select("k", "v", "name").orderBy("v").collect().toSeq
    assert(run(big) === run(big.repartition(13)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val newDf = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val got = JoinOps.snapshotDiff(oldDf, newDf, Seq("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff classifies on row presence, not hash nullability") {
    // a null content expression (md5(null) is null) must not turn a
    // both-sides key into 'added'/'removed'
    val oldDf = Seq((1L, Option.empty[String]), (2L, Some("b")),
      (3L, Some("c"))).toDF("k", "v")
    val newDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("k", "v")
    val got = JoinOps.snapshotDiff(oldDf, newDf, Seq("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", // null <=> null
      2L -> "changed",   // value -> null is a change, not an add
      3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff with composite keys and multi-column content") {
    val oldDf = Seq((1L, 1, 10.0, "x"), (1L, 2, 20.0, "y"))
      .toDF("k1", "k2", "amt", "tag")
    val newDf = Seq((1L, 1, 10.0, "x"), (1L, 2, 21.0, "y"))
      .toDF("k1", "k2", "amt", "tag")
    val got = JoinOps.snapshotDiff(oldDf, newDf, Seq("k1", "k2"),
        concat_ws("|", col("amt").cast("string"), col("tag")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(got === Map((1L, 1) -> "unchanged", (1L, 2) -> "changed"))
  }

  test("snapshotDiff only shuffles key+hash, never content columns") {
    // the exchange inputs must not reference the wide content column
    val oldDf = Seq((1L, "wide")).toDF("k", "payload")
    val newDf = Seq((1L, "wide")).toDF("k", "payload")
    val plan = JoinOps.snapshotDiff(oldDf, newDf, Seq("k"),
        col("payload")).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val out = e.child.output.map(_.name).toSet
      assert(!out.contains("payload"),
        s"exchange ships content column: $out")
    }
  }
}
