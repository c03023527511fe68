package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over edge lists — used for
  * centrality-weighted data selection (rank web/document nodes by a
  * link or similarity graph, then sample by rank — the Common-Crawl
  * host-graph trick applied to the k-NN similarity graph that
  * [[Similarity.knnGraph]] already builds).
  *
  * All arithmetic is INTEGER (ranks in 1e-9 "nano" units, damping as
  * the exact rational 85/100): integer sums are summation-order
  * immune, so the result is bit-identical across partitionings,
  * retries, and engines — a DuckDB oracle can replay every iteration
  * exactly. The deliberate trade: floor-division truncation loses
  * ≤ 1e-9 rank per (edge, iteration) vs real-valued PageRank —
  * far below any ranking-relevant difference.
  */
object Graphs {

  /** PageRank by power iteration over a directed edge list.
    *
    * Node set = distinct sources ∪ destinations. Every node starts
    * at rank 1.0 (1e9 nanos); one iteration sends each node
    * `floor(85 · r / (100 · outdeg))` nanos along each out-edge and
    * resets it to `0.15 + Σ incoming` (the per-node teleport form of
    * PageRank with d = 0.85; ranks sum to ≈ N). Dangling nodes (no
    * out-edges) keep receiving but distribute nothing — their
    * outflow leaks, the standard simplification when the graph (like
    * a k-NN graph) has none or few.
    *
    * Returns (id, rank_nanos: long) — callers divide by 1e9 for the
    * conventional scale.
    *
    * Scale shape: per iteration, ONE equi-join of the slim
    * (id, rank) table with the (src, dst, outdeg) edge table on the
    * source key and ONE map-side-combined sum keyed by destination —
    * both hash-partitioned by node id, nothing wider than three
    * longs ever shuffles, and the edge table's partitioning is
    * reusable across all iterations. No windows, no data-sized
    * collects, no driver-side graph. Overflow bound: a node's rank
    * is ≤ the total mass ≤ N·1e9 nanos, so 85·rank stays inside a
    * long for N < 10^11 nodes.
    *
    * Lineage: each iteration's plan nests the previous one's; for
    * the few fixed iterations used here (≤ 10) that is fine — for
    * long chains callers should checkpoint, as
    * [[Dedup.connectedComponents]] does.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iterations: Int = 5): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count("*").as("outdeg"))
    // (src, dst, outdeg) is iteration-invariant; keep it materialized
    // once rather than re-deriving the degree join every round.
    val withDeg = e.join(outdeg, "src")

    var ranks = nodes.withColumn("rank_nanos", lit(1000000000L))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("(85 * rank_nanos) div (100 * outdeg)").as("c"))
        .groupBy("id").agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(150000000L) + coalesce(col("inflow"), lit(0L))).as("rank_nanos"))
    }
    ranks.orderBy("id")
  }

  /** Semi-supervised label propagation (the classic LPA step applied
    * to data labeling: spread a small seed set's labels across the
    * similarity graph). Per iteration every node takes the MODE of
    * its in-neighbors' current labels — ties broken by the SMALLEST
    * label so the result is deterministic — except seed nodes, whose
    * labels are clamped, and nodes with no labeled in-neighbor,
    * which keep their previous label (null until first reached).
    *
    * Returns (id, label) for every node, label null if never
    * reached. All arithmetic is exact (counts + integer labels) —
    * bit-identical across partitionings and engines.
    *
    * Scale shape per iteration: one equi-join of the slim
    * (id, label) table with the edge list on the source key, one
    * map-side-combined (dst, label) count, and one (dst)-keyed
    * arg-max — computed as `max(struct(cnt, -label))`, an
    * aggregation, NOT a window, so a hub node's candidate list
    * never sorts. Labels must be non-negative ints (the -label
    * tie-break trick needs the sign).
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       srcCol: String = "src", dstCol: String = "dst",
                       idCol: String = "id", labelCol: String = "label",
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val seed = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("int").as("seed_label"))
    var labels = nodes.join(seed, Seq("id"), "left")
      .select(col("id"), col("seed_label").as("label"))
    for (_ <- 1 to iterations) {
      val votes = e.join(labels.withColumnRenamed("id", "src"), "src")
        .filter(col("label").isNotNull)
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count("*").as("cnt"))
      val mode = votes.groupBy("id")
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("mode_label"))
      labels = labels.join(mode, Seq("id"), "left")
        .join(seed, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("seed_label"), col("mode_label"), col("label")).as("label"))
    }
    labels.orderBy("id")
  }
}
