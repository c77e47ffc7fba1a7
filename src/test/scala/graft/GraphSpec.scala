package graft

import org.apache.spark.sql.functions._
import graft.analytics.Graph

/** Fixed-point PageRank semantics: exact agreement with a driver-side
  * reference implementation of the same integer recurrence, symmetry,
  * and centrality ordering. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference integer PageRank — the same BIGINT recurrence the
    * distributed operator (and the SQL oracle) computes, in plain
    * Scala. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val deg = adj.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = adj.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val base = (15L * scale) / (100L * n)
    var r = nodes.map(v => v -> scale / n).toMap
    for (_ <- 0 until iters) {
      val sums = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(v => v -> (base + (85L * sums(v)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("id_a", "id_b"), "id_a", "id_b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the driver-side integer recurrence exactly") {
    // star (1 center, 3 leaves) + disjoint path: asymmetric degrees,
    // two components
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    assert(run(edges, 10) == refPageRank(edges, 10))
  }

  test("symmetric graph gives equal ranks; star center dominates") {
    val path = run(Seq((1L, 2L)), 10)
    assert(path(1L) == path(2L))
    val star = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)), 10)
    assert(star(1L) > star(2L))
    assert(star(2L) == star(3L) && star(3L) == star(4L))
  }

  test("labelPropagate: majority vote, smallest label on ties") {
    import spark.implicits._
    // node 4 touches seeds 1 (a), 2 (a), 3 (b) -> majority 'a';
    // node 5 touches 2 (a) and 3 (b) -> tie, smallest label 'a'... so
    // use labels that make the tie-break visible: 2 -> 'z', 3 -> 'b'
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (2L, 5L), (3L, 5L))
      .toDF("u", "v")
    val seeds = Seq((1L, "z"), (2L, "z"), (3L, "b"))
      .toDF("u", "lbl")
    val got = graft.analytics.Graph
      .labelPropagate(edges, "u", "v", seeds, "lbl", iters = 1)
      .as[(Long, String)].collect().toMap
    assert(got(4L) === "z") // majority 2x z beats 1x b
    assert(got(5L) === "b") // tie 1-1: lexicographically smallest
  }

  test("labelPropagate: seeds are clamped; labels spread over rounds") {
    import spark.implicits._
    // chain 1-2-3-4, seed only node 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val seeds = Seq((1L, "x")).toDF("u", "lbl")
    val one = graft.analytics.Graph
      .labelPropagate(edges, "u", "v", seeds, "lbl", 1)
      .as[(Long, String)].collect().toMap
    assert(one === Map(1L -> "x", 2L -> "x"))
    val three = graft.analytics.Graph
      .labelPropagate(edges, "u", "v", seeds, "lbl", 3)
      .as[(Long, String)].collect().toMap
    assert(three === Map(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "x"))
  }

  test("triangleCensus: counts each triangle once; coefficient exact") {
    import spark.implicits._
    // K3 on {1,2,3} plus pendant edge 3-4:
    // 1 triangle; degrees 2,2,3,1 -> wedges 1+1+3+0 = 5; cc = 3/5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (2L, 1L)) // duplicate reversed edge must collapse
      .toDF("u", "v")
    val r = graft.analytics.Graph.triangleCensus(edges, "u", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_wedges") === 5L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Double]("clustering_coeff") === 0.6)
  }

  test("triangleCensus: triangle-free graph has zero coefficient") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val r = graft.analytics.Graph.triangleCensus(star, "u", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Double]("clustering_coeff") === 0.0)
  }

  test("degreeStats: star graph is perfectly disassortative") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val r = graft.analytics.Graph.degreeStats(star, "u", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("min_deg") === 1L)
    assert(r.getAs[Long]("max_deg") === 3L)
    assert(r.getAs[Double]("avg_deg") === 1.5)
    // directed pairs (3,1)×3 + (1,3)×3 → r = −1 exactly
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("degreeStats: constant-degree graph has undefined assortativity") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val r = graft.analytics.Graph.degreeStats(cycle, "u", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("personalizedPageRank: hand-computed fixed-point recurrence") {
    import spark.implicits._
    // single edge 1–2, seed {1}, scale 10⁶, d = 0.85, 2 rounds:
    //   r⁰ = {1→1000000}
    //   r¹ = {1→150000 (base, no inflow), 2→850000}
    //   r² = {1→722500+150000, 2→127500}
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    def run(iters: Int) = graft.analytics.Graph.personalizedPageRank(
        edges, "a", "b", seeds, "node", iters = iters, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === Map(1L -> 150000L, 2L -> 850000L))
    assert(run(2) === Map(1L -> 872500L, 2L -> 127500L))
  }

  test("personalizedPageRank: isolated seeds keep teleport mass") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val seeds = Seq(Tuple1(5L)).toDF("node")
    val got = graft.analytics.Graph.personalizedPageRank(
        edges, "a", "b", seeds, "node", iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 is not in the graph: no inflow ever, base mass each round;
    // nodes 1/2 never receive anything (the only mass is on 5)
    assert(got(5L) === 150000L)
    assert(!got.contains(1L) || got(1L) === 0L)
  }

  test("personalizedPageRank: partitioning-insensitive integer ranks") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val seeds = Seq(Tuple1(1L), Tuple1(4L)).toDF("node")
    def run(e: org.apache.spark.sql.DataFrame) =
      graft.analytics.Graph.personalizedPageRank(
          e, "a", "b", seeds, "node", iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(edges) === run(edges.repartition(7)))
  }

  test("approxTriangles: p = 1 reproduces the exact census") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
      .toDF("u", "v")
    val exact = graft.analytics.Graph.triangleCensus(edges, "u", "v")
      .collect()(0).getAs[Long]("n_triangles")
    val r = graft.analytics.Graph.approxTriangles(edges, "u", "v",
      pNum = 1, pDen = 1).collect()(0)
    assert(r.getAs[Long]("t_sparse") === exact)
    assert(r.getAs[Long]("est_triangles") === exact)
    assert(r.getAs[Long]("n_sampled_edges") === r.getAs[Long]("n_edges"))
  }

  test("approxTriangles: deterministic coin, measured error envelope") {
    import spark.implicits._
    // K24 clique: C(24,3) = 2024 triangles, C(24,2) = 276 edges. The
    // md5 coin is deterministic, so this is a pinned measurement of
    // the estimator on a known-T graph, not a flaky random draw.
    val k = 24
    val edges = (for {
      i <- 1 to k; j <- (i + 1) to k
    } yield (i.toLong, j.toLong)).toDF("u", "v")
    val truth = k.toLong * (k - 1) * (k - 2) / 6
    val r = graft.analytics.Graph.approxTriangles(edges, "u", "v",
      pNum = 1, pDen = 2, seed = 7).collect()(0)
    assert(r.getAs[Long]("n_edges") === k.toLong * (k - 1) / 2)
    // p = 1/2 keeps about half the edges (deterministic hash spread)
    val kept = r.getAs[Long]("n_sampled_edges")
    assert(kept > 100 && kept < 180, s"kept=$kept")
    val est = r.getAs[Long]("est_triangles")
    // DOULION envelope: within 40% of truth on this draw (measured;
    // deterministic forever for this graph + seed)
    assert(math.abs(est - truth).toDouble / truth < 0.4,
      s"est=$est truth=$truth")
    // identical draw is reproduced under any partitioning
    val r2 = graft.analytics.Graph.approxTriangles(
      edges.repartition(13), "u", "v", pNum = 1, pDen = 2, seed = 7)
      .collect()(0)
    assert(r2.getAs[Long]("t_sparse") === r.getAs[Long]("t_sparse"))
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int = 8): Map[Long, Long] =
    graft.analytics.Graph.kCore(edges.toDF("u", "v"), "u", "v", k,
      rounds).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: pendant chain peels in cascade to the triangle") {
    // triangle {1,2,3} + chain 3-4-5-6: node 6 falls first, which
    // exposes 5, then 4 — three dependent peel rounds for k=2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L))
    assert(core(edges, k = 2) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: rounds cap truncates the cascade mid-peel") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L))
    // one peel only: 6 (deg 1) is gone, 5's degree has dropped to 1
    // but its removal belongs to the next round
    assert(core(edges, k = 2, rounds = 1) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("kCore: a graph that already is a k-core survives unchanged") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(core(square, k = 2) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("kCore: k above the max degree empties the graph") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(core(square, k = 3) === Map.empty)
  }

  test("kCore: result is partitioning-invariant") {
    val edges = (1 to 40).flatMap { i =>
      Seq((i.toLong, (i % 40 + 1).toLong),
        (i.toLong, ((i + 7) % 40 + 1).toLong))
    }
    val a = core(edges, k = 3)
    val b = graft.analytics.Graph.kCore(
        edges.toDF("u", "v").repartition(11), "u", "v", 3, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  private def lcc(edges: Seq[(Long, Long)]) =
    graft.analytics.Graph.localClustering(
        edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap

  test("localClustering: triangle with a pendant") {
    // triangle {1,2,3} + pendant 3-4: node 3 has degree 3, one of its
    // three neighbor pairs connected -> 1/3; pendant has lcc null
    val got = lcc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got(1L) === ((2L, 1L, Some(1.0))))
    assert(got(2L) === ((2L, 1L, Some(1.0))))
    assert(got(3L) === ((3L, 1L, Some(1.0 / 3))))
    assert(got(4L) === ((1L, 0L, None)))
  }

  test("localClustering: K4 is all-ones and counts C(3,2) wedges") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = lcc(k4)
    assert(got.size === 4)
    got.values.foreach { case (d, t, c) =>
      assert(d === 3L && t === 3L && c === Some(1.0))
    }
  }

  test("localClustering: triangle-free path reports zero lcc") {
    val got = lcc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got(2L) === ((2L, 0L, Some(0.0))))
    assert(got(1L) === ((1L, 0L, None)))
  }

  test("localClustering: per-node counts sum to 3x the census") {
    val edges = (1 to 40).flatMap { i =>
      Seq((i.toLong, (i % 40 + 1).toLong),
        (i.toLong, ((i + 7) % 40 + 1).toLong),
        (i.toLong, ((i + 13) % 40 + 1).toLong))
    }
    val per = lcc(edges)
    val census = graft.analytics.Graph.triangleCensus(
        edges.toDF("u", "v"), "u", "v")
      .collect()(0).getAs[Long]("n_triangles")
    assert(per.values.map(_._2).sum === 3L * census)
    val shuffled = graft.analytics.Graph.localClustering(
        edges.toDF("u", "v").repartition(11), "u", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(shuffled === per)
  }

  test("modularity: two cliques with one bridge score near 1/2; " +
      "random labels on one clique score 0 territory") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], labs: Seq[(Long, String)]) =
      graft.analytics.Graph.modularity(edges.toDF("u", "v"), "u", "v",
          labs.toDF("n", "l"), "n", "l")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4)))).toMap
    // two triangles joined by one bridge edge, labeled by side:
    // m=7; each side: e_c=3, d_c=7 -> Q_c = (4*7*3-49)/196 = 35/196
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val labs = (1L to 3L).map(_ -> "a") ++ (4L to 6L).map(_ -> "b")
    val got = run(tri1 ++ tri2 :+ ((3L, 4L)), labs)
    assert(got("a") === ((3L, 3L, 7L, 35.0 / 196)))
    assert(got("b") === ((3L, 3L, 7L, 35.0 / 196)))
    // all-one-label on a single triangle: Q = e/m - 1 = 0
    val one = run(tri1, (1L to 3L).map(_ -> "x"))
    assert(one("x")._4 === (4.0 * 3 * 3 - 36) / 36)
    // unlabeled endpoint drops its edges entirely
    val dropped = run(tri1 :+ ((3L, 9L)), (1L to 3L).map(_ -> "x"))
    assert(dropped("x")._2 === 3L && dropped.size === 1)
  }

  test("bfsHops: chain distances, early exhaustion, off-graph seeds") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long], h: Int) =
      graft.analytics.Graph.bfsHops(edges.toDF("u", "v"), "u", "v",
          seeds.toDF("n"), "n", h)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(chain, Seq(1L), 4) ===
      Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L))
    // cap cuts the walk short
    assert(run(chain, Seq(1L), 2) === Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
    // two seeds meet in the middle; exhaustion before the cap
    assert(run(chain, Seq(1L, 5L), 4) === Map(0 -> 2L, 1 -> 2L, 2 -> 1L))
    // a seed with no edges still counts at hop 0
    assert(run(chain, Seq(1L, 99L), 1) === Map(0 -> 2L, 1 -> 1L))
  }

  private def hitsMap(edges: Seq[(Long, Long)], iters: Int = 3) =
    graft.analytics.Graph.hits(edges.toDF("c", "s"), "c", "s", iters)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hits: the hub covering every authority dominates; the " +
      "authority seen by both hubs dominates") {
    // hub 1 -> {10, 11}; hub 2 -> {11}: authority 11 has two
    // endorsers, 10 one; hub 1 endorses more authority mass
    val got = hitsMap(Seq((1L, 10L), (1L, 11L), (2L, 11L)))
    assert(got(("hub", 1L)) === 1000000000000L)
    assert(got(("authority", 11L)) === 1000000000000L)
    assert(got(("hub", 1L)) > got(("hub", 2L)))
    assert(got(("authority", 11L)) > got(("authority", 10L)))
  }

  test("hits: symmetric complete bipartite graph scores all-equal") {
    val edges = for (c <- 1L to 3L; s <- 10L to 12L) yield (c, s)
    val got = hitsMap(edges)
    (1L to 3L).foreach(c =>
      assert(got(("hub", c)) === 1000000000000L))
    (10L to 12L).foreach(s =>
      assert(got(("authority", s)) === 1000000000000L))
  }

  test("hits: duplicate and null edges are ignored, result is " +
      "repartition-invariant") {
    val edges = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 11L),
      (3L, 12L), (2L, 12L))
    val base = hitsMap(edges)
    val viaNull = graft.analytics.Graph.hits(
        (edges.map { case (a, b) => (Option(a), Option(b)) } :+
          ((Option.empty[Long], Option(10L)))).toDF("c", "s"),
        "c", "s", 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaNull === base)
    val shuf = graft.analytics.Graph.hits(
        edges.reverse.toDF("c", "s").repartition(7), "c", "s", 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(shuf === base)
  }

  test("rank mass is conserved up to floor losses") {
    val scale = 1000000000000L
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)), 10)
    val total = r.values.sum
    // floor losses only shrink mass, and by less than (base + 1) per
    // node per iteration
    assert(total <= scale)
    assert(total > scale - 10L * r.size * 2L - scale / 100L)
  }
}
