package graft

import graft.operators.Graphs

/** Hand-computed integer-PageRank cases. Ranks are in 1e-9 nano
  * units; every expectation below is exact long arithmetic
  * (floor-divided contributions + 0.15 teleport), not a float
  * approximation.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference implementation: the same integer recurrence, computed
    * serially on the driver. */
  private def serial(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- e) inflow(d) += (85L * r(s)) / (100L * out(s))
      r = nodes.map(n => n -> (150000000L + inflow(n))).toMap
    }
    r
  }

  test("2-cycle: symmetric nodes converge to rank 1.0 exactly") {
    // a <-> b, outdeg 1 each: contribution = 85% of 1e9 = 850e6,
    // rank = 150e6 + 850e6 = 1e9 every iteration — a fixed point.
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("star graph: hand-computed two iterations") {
    // 1 -> 2, 1 -> 3, 2 -> 1, 3 -> 1 (undirected star around 1).
    // it1: node 1 gets 850e6 from each leaf = 150e6 + 1700e6 = 1850e6;
    //      leaves get (85 * 1e9) div 200 = 425e6 → 575e6 each.
    // it2: node 1 = 150e6 + 2 * floor(85 * 575e6 / 100) = 150e6 + 2*488750000
    //      leaves  = 150e6 + floor(85 * 1850e6 / 200) = 150e6 + 786250000
    val r = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), iters = 2)
    assert(r(1L) === 150000000L + 2L * 488750000L)
    assert(r(2L) === 150000000L + 786250000L)
    assert(r(3L) === r(2L))
  }

  test("dangling node: receives but never distributes (mass leaks, ranks stay exact)") {
    // 1 -> 2 only: node 2 has no out-edges.
    // it1: r1 = 150e6, r2 = 150e6 + 850e6 = 1e9
    // it2: r1 = 150e6, r2 = 150e6 + floor(85 * 150e6 / 100) = 150e6 + 127500000
    val r = ranksOf(Seq((1L, 2L)), iters = 2)
    assert(r(1L) === 150000000L)
    assert(r(2L) === 150000000L + 127500000L)
  }

  test("matches the serial integer recurrence on a random graph, any partitioning") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(200)((rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val expected = serial(edges, 4)
    val df = edges.toDF("src", "dst").repartition(7) // adversarial partitioning
    val got = Graphs.pageRank(df, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("duplicate edge rows collapse (edge list is a set, not a multiset)") {
    val r = ranksOf(Seq((1L, 2L), (1L, 2L), (2L, 1L)), iters = 3)
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("iteration bounds are validated") {
    intercept[IllegalArgumentException] {
      Graphs.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(Seq((1L, 2L)).toDF("src", "dst"), toleranceNanos = -1L)
    }
  }

  test("tolerance early-exit: a converged graph stops moving, result unchanged") {
    // The 2-cycle is a fixed point from iteration 1 (Σ|Δr| = 0), so
    // with a tolerance the 50-iteration budget exits early — and must
    // return exactly the fixed-iteration answer.
    val edges = Seq((1L, 2L), (2L, 1L))
    val strict = ranksOf(edges, iters = 5)
    val t0 = System.nanoTime()
    val eager = Graphs.pageRank(edges.toDF("src", "dst"),
        iterations = 50, toleranceNanos = 0L + 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eager === strict)
    // Sanity that it did not run all 50 rounds: 50 iterated joins on
    // this suite's session take far longer than the early-exit path.
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("tolerance early-exit: an unconverged graph matches the serial recurrence at exit") {
    // Star graph converges geometrically; with a coarse tolerance the
    // exit happens after the first round whose movement is under it,
    // and the returned ranks must equal the serial recurrence run for
    // that same number of rounds.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"),
        iterations = 50, toleranceNanos = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Find the serial round count with the same movement criterion.
    var k = 1
    while ({
      val prev = serial(edges, k - 1); val cur = serial(edges, k)
      val moved = cur.map { case (n, r) => math.abs(r - prev(n)) }.sum
      moved > 1000000L && k < 50
    }) k += 1
    assert(got === serial(edges, k))
  }

  private def lpOn(edges: Seq[(Long, Long)], seeds: Seq[(Long, Int)],
                   iters: Int): Map[Long, Option[Int]] =
    Graphs.labelPropagation(edges.toDF("src", "dst"), seeds.toDF("id", "label"),
        iterations = iters)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap

  test("label propagation: a chain reaches one hop per iteration") {
    // 1(seed 7) -> 2 -> 3 -> 4, edges directed down the chain.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(lpOn(edges, Seq((1L, 7)), 1) ===
      Map(1L -> Some(7), 2L -> Some(7), 3L -> None, 4L -> None))
    assert(lpOn(edges, Seq((1L, 7)), 3) ===
      Map(1L -> Some(7), 2L -> Some(7), 3L -> Some(7), 4L -> Some(7)))
  }

  test("label propagation: mode wins; ties break to the smallest label") {
    // node 10 hears label 3 from two sources and label 9 from one →
    // mode 3. Node 11 hears 2 and 5 once each → tie → smallest (2).
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L), (5L, 11L))
    val seeds = Seq((1L, 3), (2L, 3), (3L, 9), (4L, 5), (5L, 2))
    val out = lpOn(edges, seeds, 1)
    assert(out(10L) === Some(3))
    assert(out(11L) === Some(2))
  }

  test("label propagation: seed labels are clamped against the neighborhood mode") {
    // seed node 2 (label 1) is bombarded with label 0 from both
    // neighbors but must keep its own label; non-seed 3 flips.
    val edges = Seq((1L, 2L), (4L, 2L), (1L, 3L))
    val seeds = Seq((1L, 0), (4L, 0), (2L, 1))
    val out = lpOn(edges, seeds, 2)
    assert(out(2L) === Some(1), "seed label clamped")
    assert(out(3L) === Some(0))
  }

  test("label propagation: node with no labeled in-neighbors keeps its previous label") {
    // 1(seed) -> 2; 2 -> 3; 3 has no labeled in-neighbors at it1.
    // After 2 iterations 3 has 2's it1 label; at it3 nothing changes
    // (2's vote set is stable) — and crucially, node 2 does NOT lose
    // its label when its only in-neighbor keeps voting.
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(lpOn(edges, Seq((1L, 4)), 3) ===
      Map(1L -> Some(4), 2L -> Some(4), 3L -> Some(4)))
  }

  // ---- triangleStats ----------------------------------------------------

  private def triOn(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graphs.triangleStats(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("triangles: K4 — every node in 3 triangles, clustering exactly 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = triOn(k4)
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    out.values.foreach { case (d, t, c) =>
      assert(d === 3L); assert(t === 3L); assert(c === 1.0)
    }
  }

  test("triangles: a chain has none — the LSH transitive-merge signature") {
    // A~B~C without A~C: exactly the over-merged cluster shape the
    // operator exists to expose — every clustering coefficient is 0.
    val out = triOn(Seq((1L, 2L), (2L, 3L)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(1L) === ((1L, 0L, 0.0)))
    assert(out(3L) === ((1L, 0L, 0.0)))
  }

  test("triangles: two triangles sharing an edge — shared nodes count both") {
    val out = triOn(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(out(4L) === ((2L, 1L, 1.0)))
    // nodes 2,3: degree 3, in both triangles, cc = 2·2/(3·2) = 2/3
    assert(out(2L)._1 === 3L); assert(out(2L)._2 === 2L)
    assert(out(2L)._3 === math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(out(3L) === out(2L))
  }

  test("triangles: duplicate and reversed input edges canonicalize to one") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L))
    val out = triOn(noisy)
    // self-loop dropped; one triangle {1,2,3}
    out.values.foreach { case (d, t, c) => assert(d === 2L && t === 1L && c === 1.0) }
  }

  test("triangles: a star hub has zero — high degree alone is not cliquishness") {
    val star = (2L to 9L).map(i => (1L, i))
    val out = triOn(star)
    assert(out(1L) === ((8L, 0L, 0.0)))
    (2L to 9L).foreach(i => assert(out(i) === ((1L, 0L, 0.0))))
  }

  test("clusterQuality: clique / chain / mixed verdicts on hand graphs, exact rollups") {
    // three disconnected components in one pair set:
    //  K4 on 1-4            → density 1,    verdict clique
    //  path 10-17 (8 nodes) → density 0.25, verdict chain
    //  triangle 20,21,22 + pendant 23 → density 2/3, verdict mixed
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val path = (10L until 17L).map(i => (i, i + 1))
    val triPend = Seq((20L, 21L), (20L, 22L), (21L, 22L), (22L, 23L))
    val out = Graphs.clusterQuality((k4 ++ path ++ triPend).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))).toMap
    assert(out.keySet === Set(1L, 10L, 20L), s"cluster ids are the min member: $out")
    assert(out(1L) === ((4L, 6L, 4L, 1.0, 1.0, "clique")))
    assert(out(10L) === ((8L, 7L, 0L, 0.25, 0.0, "chain")))
    // triangle+pendant: clustering 1, 1, 1/3, 0 → avg 0.5833 at 4 dp
    assert(out(20L) === ((4L, 4L, 1L, 0.666667, 0.5833, "mixed")))
  }

  test("clusterQuality: verdict boundaries are integer-exact (density exactly 0.8 and 0.3)") {
    // density exactly 0.8: n=5, C(5,2)=10, E=8 → 10·8 ≥ 4·5·4 (80 ≥ 80) → clique
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val fiveMinus2 = k5.filterNot(e => e == ((1L, 2L)) || e == ((3L, 4L)))
    // density exactly 0.3: n=16, C(16,2)=120, E=36 → 20·36 < 3·240
    // is 720 < 720 = false → mixed, not chain (strict <)
    val path16 = (30L until 45L).map(i => (i, i + 1))
    val extra = (for { a <- 30L to 45L; b <- (a + 1) to 45L } yield (a, b))
      .filterNot(path16.contains).take(36 - path16.size)
    val g16 = path16 ++ extra
    assert(g16.size === 36)
    val out = Graphs.clusterQuality((fiveMinus2 ++ g16).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(6)))).toMap
    assert(out(1L) === ((5L, 8L, "clique")), s"density 0.8 lands clique (>=): $out")
    assert(out(30L) === ((16L, 36L, "mixed")), s"density 0.3 lands mixed (strict <): $out")
  }

  test("triangles: matches a serial brute-force count on an arbitrary graph") {
    // deterministic pseudo-random graph on 12 nodes
    val edges = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L
      if ((a * 31 + b * 17) % 5) < 2
    } yield (a, b)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val serialTri = adj.keys.map { v =>
      val nb = adj(v).toSeq
      v -> nb.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }
    }.toMap
    val out = triOn(edges)
    assert(out.keySet === adj.keySet)
    adj.keys.foreach { v =>
      assert(out(v)._1 === adj(v).size.toLong, s"degree of $v")
      assert(out(v)._2 === serialTri(v).toLong, s"triangles of $v")
    }
  }

  test("graphSuite: per-node CC + triangle composition on hand graphs") {
    // triangle 1-2-3 with pendant 4, plus a disjoint edge 10-11
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (10L, 11L))
    val out = Graphs.graphSuite(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L))
    // (cluster_id, degree, n_triangles, clustering)
    assert(out(1L) === ((1L, 2L, 1L, 1.0)))
    assert(out(2L) === ((1L, 2L, 1L, 1.0)))
    assert(out(3L) === ((1L, 3L, 1L, 0.333333)))
    assert(out(4L) === ((1L, 1L, 0L, 0.0)))
    assert(out(10L) === ((10L, 1L, 0L, 0.0)))
    assert(out(11L) === ((10L, 1L, 0L, 0.0)))
  }

  test("graphSuite composition equals its standalone parts") {
    val edges = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L
      if ((a * 31 + b * 17) % 5) < 2
    } yield (a, b)).toDF("id_a", "id_b")
    val suite = Graphs.graphSuite(edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val cc = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tri = Graphs.triangleStats(edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(suite.keySet === cc.keySet && suite.keySet === tri.keySet)
    suite.foreach { case (n, (cid, d, t, c)) =>
      assert(cid === cc(n) && (d, t, c) === tri(n), s"node $n")
    }
  }

  test("embeddingGraphSuite: composition equals standalone pageRank + labelPropagation") {
    // small deterministic embedding corpus; same params both paths
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 13 + j * 7) % 19) - 9).toFloat / 9f),
        (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val suite = Graphs.embeddingGraphSuite(emb, "embedding", "vec_id", "label",
        dim = 8, k = 3, nPlanes = 4, nTables = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getInt(3)))))
      .toMap
    val edges = graft.operators.Similarity
      .knnGraph(emb, "embedding", "vec_id", dim = 8, k = 3, nPlanes = 4, nTables = 2)
      .select(org.apache.spark.sql.functions.col("src_id"),
        org.apache.spark.sql.functions.col("nbr_id"))
    val pr = Graphs.pageRank(edges, "src_id", "nbr_id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp = Graphs.labelPropagation(edges,
        emb.filter($"vec_id" % 5 === 0).select($"vec_id", $"label"),
        "src_id", "nbr_id", "vec_id", "label", 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val deg = edges.groupBy("src_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(suite.nonEmpty && suite.keySet === pr.keySet)
    suite.foreach { case (n, (d, rank, label)) =>
      assert(rank === pr(n) && label === lp(n), s"node $n")
      assert(d === deg.getOrElse(n, 0L), s"out-degree of $n (dangling → 0)")
    }
  }
}
