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
  }
}
