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

  /** Eager local checkpoint that also RESETS inherited plan
    * statistics ([[org.apache.spark.sql.graftbridge.CheckpointBridge]]):
    * plain `localCheckpoint` carries the origin `sizeInBytes` onto
    * the LogicalRDD, and a loop frame joined against itself squares
    * that BigInt every round — stats arithmetic ends up dominating
    * the round (measured ~3×/round growth) and finally overflows.
    */
  private def graftCheckpoint(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointBridge.localCheckpointFreshStats(df)

  /** Run two independent eagerly-materializing builds concurrently
    * (guide-§2.6 job overlap): Spark's scheduler happily runs several
    * jobs at once inside one application — the suites' halves are
    * only sequential because single-threaded driver code calls their
    * actions sequentially. Each body runs on its own thread so one
    * side's tasks backfill the other's inter-stage driver gaps;
    * exceptions rethrow on the caller. FIFO scheduling keeps the
    * earlier job's resource priority — exactly the backfill behavior
    * wanted here.
    */
  /** N-way [[inParallel]] for a homogeneous list of independent
    * eagerly-materializing builds (r15: the recall profiles' per-depth
    * / per-banding branches). Same semantics: FIFO backfill,
    * exceptions rethrow on the caller, results in input order.
    */
  private[operators] def inParallelSeq[A](bodies: Seq[() => A]): Seq[A] = {
    if (bodies.size <= 1) bodies.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(bodies.size)
      try {
        val fs = bodies.map(b => pool.submit(
          new java.util.concurrent.Callable[A] { def call(): A = b() }))
        fs.map(_.get())
      } catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      } finally pool.shutdown()
    }
  }

  private[operators] def inParallel[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[A] { def call(): A = a })
      val fb = pool.submit(new java.util.concurrent.Callable[B] { def call(): B = b })
      (fa.get(), fb.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
  }

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
    * Lineage & caching: the (src, dst, outdeg) edge frame — which at
    * production scale embeds the entire upstream k-NN-graph build —
    * is PERSISTED before the loop and computed exactly once; the rank
    * frame is eagerly `localCheckpoint`ed every 3 rounds (and at
    * exit, so the caches can be freed before returning) to bound the
    * iterative-join lineage — the [[Dedup.connectedComponents]]
    * pattern.
    *
    * `toleranceNanos` > 0 adds a convergence early-exit: stop when
    * the total absolute rank movement Σ|Δr| of a round is ≤ the
    * tolerance (an exact integer test — no float drift), so
    * large-scale callers don't pay fixed iterations past
    * convergence. The convergence probe rides the round's
    * checkpointed frame — one action per round, no recompute. The
    * default 0 keeps the fixed-iteration form (the oracle-replayable
    * contract).
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
               iterations: Int = 5, toleranceNanos: Long = 0L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(toleranceNanos >= 0L,
      s"toleranceNanos must be >= 0, got $toleranceNanos")
    // EAGER fresh-stats checkpoint, not a lazy persist: a persisted
    // frame still carries its full logical subtree (at production
    // scale, the whole upstream k-NN-graph build) into EVERY round's
    // analyzed plan, and the driver re-plans that tree once per AQE
    // stage — measured r14: 27.5 s of the standalone emb_pagerank's
    // 40 s wall was zero-task inter-stage driver gap, while the suite
    // variant (which checkpoints edges first) ran the same rounds
    // with sub-second gaps. The checkpoint truncates each round to a
    // few joins over ExistingRDD leaves; the edge build still runs
    // exactly once (now in its own small-plan job).
    val e = graftCheckpoint(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    val outdeg = e.groupBy("src").agg(count("*").as("outdeg"))
    // (src, dst, outdeg) is iteration-invariant: persist it so every
    // round's join reads cached blocks (its lineage is now two narrow
    // ops over the checkpointed edge RDD, so the cached subtree the
    // rounds re-plan is tiny).
    val withDeg = e.join(outdeg, "src").persist()

    var ranks = nodes.withColumn("rank_nanos", lit(1000000000L))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val next = pageRankRound(withDeg, nodes, ranks)
      if (toleranceNanos > 0L) {
        val flagged = graftCheckpoint(next.as("n").join(ranks.as("o"), Seq("id"))
          .select(col("id"), col("n.rank_nanos").as("rank_nanos"),
            abs(col("n.rank_nanos") - col("o.rank_nanos")).as("__delta")))
        val moved = flagged.agg(coalesce(sum("__delta"), lit(0L))).head.getLong(0)
        ranks = flagged.select("id", "rank_nanos")
        converged = moved <= toleranceNanos
      } else {
        ranks =
          if ((it + 1) % 3 == 0 && it + 1 < iterations)
            graftCheckpoint(next)
          else next
      }
      it += 1
    }
    // Materialize the result before dropping the caches it was built
    // from, so the caller's action never re-derives the edge frame.
    val out = graftCheckpoint(ranks)
    withDeg.unpersist()
    nodes.unpersist()
    out.orderBy("id")
  }

  /** One power-iteration round — the plan the cluster actually pays
    * per iteration (the public entry checkpoints its result, so plan
    * audits must look HERE): one source-keyed equi-join, one
    * map-side-combined destination sum, one left join back onto the
    * node set. Package-private test seam.
    */
  private[graft] def pageRankRound(withDeg: DataFrame, nodes: DataFrame,
                                   ranks: DataFrame): DataFrame = {
    val contribs = withDeg
      .join(ranks.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"),
        expr("(85 * rank_nanos) div (100 * outdeg)").as("c"))
      .groupBy("id").agg(sum(col("c")).as("inflow"))
    nodes
      .join(contribs, Seq("id"), "left")
      .select(col("id"),
        (lit(150000000L) + coalesce(col("inflow"), lit(0L))).as("rank_nanos"))
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
    // The edge list (at scale, the whole upstream k-NN-graph build)
    // is iteration-invariant: EAGER fresh-stats checkpoint, not a
    // lazy persist — a persisted frame still carries the full edge
    // build's logical subtree into every round's analyzed plan, and
    // the driver re-plans it per AQE stage (the measured r14
    // emb_pagerank pathology: 27.5 s of zero-task driver gap; see
    // pageRank). The slim seed table stays a persist; the label frame
    // is checkpointed every 3 rounds (and at exit) to bound the
    // iterative-join lineage.
    val e = graftCheckpoint(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val seed = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("int").as("seed_label")).persist()
    // the clamped seed label RIDES the iteration frame (one extra int
    // column through the checkpoints) so no round re-joins the seed
    // table — one fewer shuffle join per iteration
    var labels = nodes.join(seed, Seq("id"), "left")
      .select(col("id"), col("seed_label"), col("seed_label").as("label"))
    for (it <- 1 to iterations) {
      labels = labelPropRound(e, labels)
      if (it % 3 == 0 && it < iterations)
        labels = graftCheckpoint(labels)
    }
    val out = graftCheckpoint(labels.select("id", "label"))
    seed.unpersist()
    out.orderBy("id")
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list — the dedup-QA companion to
    * [[Dedup.connectedComponents]]: a near-dup cluster whose nodes
    * have clustering ≈ 1 is a genuine clique of mutual duplicates,
    * while a large cluster full of low-clustering nodes was merged by
    * TRANSITIVE CHAINS (A~B~C with A≁C) — the classic LSH
    * over-merge signature that pairwise thresholds can't see.
    *
    * Algorithm: degree-ordered node-iterator (the standard
    * distributed formulation). Each edge is oriented from its
    * (degree, id)-smaller endpoint to its larger one; wedges are
    * enumerated at the SMALLEST-ranked vertex of each triangle by
    * self-joining the oriented list on the source, and a wedge
    * (x→y, x→z) closes iff the oriented edge y→z exists — so every
    * triangle is produced exactly once. Orientation bounds the
    * per-node wedge fan-out by the oriented out-degree, which the
    * degree ordering caps at O(√m) on any graph — total work
    * O(m^1.5), the best exact bound, vs the unordered iterator's
    * O(Σ d²) that a single hub makes quadratic. Per-node counts are
    * orientation-invariant, so an id-ordered SQL oracle reproduces
    * them exactly.
    *
    * Scale shape: degrees are one map-side-combined count; the
    * orientation joins, the wedge self-join, and the closing join all
    * key on 8-byte node ids or (long, long) pairs — nothing wider
    * than three longs ever shuffles, no windows, no driver-side
    * graph. The oriented edge frame is persisted: it feeds both sides
    * of the wedge join and the closing probe.
    *
    * Returns (node, degree, n_triangles, clustering) for every node
    * with degree ≥ 1, clustering = 2T / (d(d−1)) rounded to 6 dp
    * (0.0 for d < 2).
    */
  def triangleStats(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame =
    triangleStatsImpl(pairs, aCol, bCol, materialize = true)

  /** [[triangleStats]] without the persist/checkpoint materialization —
    * the plan-audit seam (the checkpoint collapses the public plan to
    * an ExistingRDD scan, hiding the join shapes audits must see).
    */
  private[graft] def triangleStatsImpl(pairs: DataFrame, aCol: String,
      bCol: String, materialize: Boolean): DataFrame = {
    val eRaw = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .dropDuplicates("u", "v")
    // The oriented edge list references e three times (both degree
    // projections and the orientation join), so without a checkpoint
    // the upstream candidate build (at scale, the whole MinHash/LSH
    // pipeline) is embedded three times in one analyzed plan —
    // exchange reuse may or may not collapse the copies, and the
    // driver re-plans the full tree per AQE stage either way (the
    // measured r14 driver-gap pathology, see pageRank). One eager
    // fresh-stats checkpoint truncates all of it.
    val e = if (materialize) graftCheckpoint(eRaw) else eRaw
    // deg is referenced four times (both orientation sides, the
    // closing-degree join, the final rollup join): persist the
    // node-sized frame so it aggregates once instead of four times.
    val degRaw = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count("*").as("d"))
    val deg = if (materialize) degRaw.persist() else degRaw
    // orient by (degree, id): rank as a single sortable struct so the
    // comparison stays one codegen'd expression
    val du = deg.select(col("node").as("u"), col("d").as("d_u"))
    val dv = deg.select(col("node").as("v"), col("d").as("d_v"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(
        when(struct(col("d_u"), col("u")) < struct(col("d_v"), col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
      .join(deg.select(col("node").as("dst"), col("d").as("d_dst")), "dst")
      .select("src", "dst", "d_dst")
    val orientedC = if (materialize) oriented.persist() else oriented
    // wedges centered at the lowest-ranked vertex: both out-neighbors,
    // ordered by rank so the closing edge (if any) is oriented y→z
    val o1 = orientedC.select(col("src"), col("dst").as("y"), col("d_dst").as("d_y"))
    val o2 = orientedC.select(col("src"), col("dst").as("z"), col("d_dst").as("d_z"))
    val wedges = o1.join(o2, "src")
      .filter(struct(col("d_y"), col("y")) < struct(col("d_z"), col("z")))
      .select(col("src").as("x"), col("y"), col("z"))
    val closing = orientedC.select(col("src").as("y"), col("dst").as("z"))
    val tri = wedges.join(closing, Seq("y", "z"))
    val perNode = tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy("node").agg(count("*").as("n_triangles"))
    val raw = deg.join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        graft.functions.MathFunctions.roundTo(when(col("d") >= 2,
            lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double") /
              (col("d").cast("double") * (col("d") - 1).cast("double")))
          .otherwise(lit(0.0)), 6).as("clustering"))
    if (!materialize) raw
    else {
      // materialize (node-sized) so the oriented/deg caches can be
      // freed before returning — the labelPropagation exit pattern
      val out = graftCheckpoint(raw)
      orientedC.unpersist()
      deg.unpersist()
      out
    }
  }

  /** Per-cluster structural quality — the actionable rollup of
    * [[triangleStats]]: for every near-dup connected component, its
    * size, edge count, edge density, mean clustering coefficient, and
    * a three-way verdict — `clique` (density ≥ 0.8: a genuine block
    * of mutual duplicates, safe to keep one canonical doc), `chain`
    * (density < 0.3: LSH transitive over-merge, the cluster should be
    * re-verified before collapsing), `mixed` otherwise. The verdict
    * thresholds compare EXACT INTEGERS (`5·E ≥ 2·n(n−1)` ⟺
    * density ≥ 0.8 without forming the quotient), so boundary
    * clusters land identically on any engine; the reported density is
    * the one IEEE division of two exact integers, quantized.
    *
    * Scale shape: the candidate pair set is PERSISTED and feeds both
    * [[Dedup.connectedComponents]] and [[triangleStats]] exactly once
    * (both materialize eagerly via fresh-stats checkpoints, after
    * which the cache is freed — the ReuseExchange-miss discipline);
    * the stats join and the cluster rollup are node-sized equi-join +
    * map-side-combined aggregation keyed by cluster id. `avgClustering`
    * is a mean of 6-dp-quantized doubles rounded at 4 dp — the
    * documented partition-order tolerance for sum-of-double columns.
    */
  def clusterQuality(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val rd = graft.functions.MathFunctions.roundTo _
    val joined = graphSuite(pairs, aCol, bCol).withColumnRenamed("node", "id")
    joined.groupBy("cluster_id")
      .agg(count("*").as("n_nodes"),
        (sum("degree") / 2).cast("long").as("n_edges"),
        (sum("n_triangles") / 3).cast("long").as("n_triangles"),
        rd(avg("clustering"), 4).as("avg_clustering"))
      .select(col("cluster_id"), col("n_nodes"), col("n_edges"), col("n_triangles"),
        rd(lit(2.0) * col("n_edges").cast("double") /
          (col("n_nodes").cast("double") * (col("n_nodes") - 1).cast("double")), 6)
          .as("density"),
        col("avg_clustering"),
        // integer-exact thresholds: 2E/(n(n-1)) >= 4/5  ⟺  5·2E >= 4·n(n-1)
        //                           2E/(n(n-1)) <  3/10 ⟺ 10·2E < 3·n(n-1)
        when(lit(10L) * col("n_edges") >= lit(4L) * col("n_nodes") * (col("n_nodes") - 1),
          lit("clique"))
          .when(lit(20L) * col("n_edges") < lit(3L) * col("n_nodes") * (col("n_nodes") - 1),
            lit("chain"))
          .otherwise(lit("mixed")).as("verdict"))
  }

  /** One-build-many-queries entry for the near-dup graph class: the
    * candidate pair set — at 100 TB, by far the dominant cost (the
    * whole MinHash/LSH candidate generation) — is built ONCE, then
    * feeds BOTH [[Dedup.connectedComponents]] and [[triangleStats]].
    * Returns the per-node composition
    * (node, cluster_id, degree, n_triangles, clustering): the frame
    * an engine user actually joins back onto the corpus to decide
    * keep/collapse/re-verify per document, and the shared base
    * [[clusterQuality]] rolls up per cluster.
    *
    * Scale shape: `pairs` is persisted and scanned exactly once by
    * each consumer (both materialize eagerly via fresh-stats
    * checkpoints, after which the cache is freed — the
    * ReuseExchange-miss discipline); the final composition is one
    * node-keyed equi-join of two node-sized frames. Running this
    * instead of the two queries separately halves the edge-build
    * cost; at bench scale the suite runs in well under the sum of
    * its parts (see ROUND11 notes).
    */
  def graphSuite(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    // Eager fresh-stats checkpoint (was a lazy persist): both
    // consumers' own internal checkpoints plan over a leaf RDD
    // instead of re-planning the candidate build's subtree, and the
    // build still runs exactly once.
    val p = graftCheckpoint(
      pairs.select(col(aCol).as("id_a"), col(bCol).as("id_b")))
    // Overlap the two independent consumers (guide §2.6 pattern):
    // both depend only on the materialized pair RDD, and each is a
    // chain of small stages with driver think-time between them —
    // submitting them from two threads lets one side's tasks backfill
    // the cores the other side's scheduling gaps leave idle (job
    // descriptions/groups are thread-local, so cancellation and UI
    // labels stay per-side).
    val (cc, tri) = inParallel(
      Dedup.connectedComponents(p),  // (id, cluster_id), checkpointed
      triangleStats(p))              // (node, degree, n_triangles, clustering)
    cc.join(tri.withColumnRenamed("node", "id"), "id")
      .select(col("id").as("node"), col("cluster_id"), col("degree"),
        col("n_triangles"), col("clustering"))
  }

  /** The embedding-side one-build-many-queries entry: the capped-LSH
    * k-NN edge list ([[Similarity.knnGraph]] — the dominant cost of
    * every embedding-graph query) is built and MATERIALIZED once,
    * then feeds out-degree, [[pageRank]], and [[labelPropagation]]
    * in one pass. Returns one row per graph node:
    * (vec_id, out_degree, rank_nanos, label) — centrality AND
    * propagated label from a single edge build, where running
    * `emb_knn_graph` + `emb_pagerank` + `emb_label_prop` separately
    * pays the bucket/top-k build three times.
    *
    * Seeds follow the emb_label_prop convention: every `seedEvery`-th
    * vector keeps its true label. Dangling nodes (dst-only) carry
    * out_degree 0.
    *
    * Scale shape: the edge frame is an eager fresh-stats checkpoint —
    * each consumer reads materialized blocks, never re-derives the
    * LSH buckets; pageRank/labelPropagation then persist their own
    * slim iteration-invariant frames as usual; the final composition
    * is two node-keyed equi-joins of node-sized frames.
    */
  def embeddingGraphSuite(emb: DataFrame, vecCol: String, idCol: String,
      labelCol: String, dim: Int, k: Int = 10, nPlanes: Int = Dedup.AutoPlanes,
      nTables: Int = 8, seedEvery: Int = 5, prIterations: Int = 5,
      lpIterations: Int = 3): DataFrame = {
    require(seedEvery >= 1, s"seedEvery=$seedEvery must be >= 1")
    val edges = graftCheckpoint(
      Similarity.knnGraph(emb, vecCol, idCol, dim, k, nPlanes, nTables)
        .select(col("src_id"), col("nbr_id")))
    // PageRank and label propagation are independent given the
    // checkpointed edge RDD: overlap their iteration jobs (§2.6) so
    // each side's tasks fill the other's inter-round driver gaps.
    val (pr, lp) = inParallel(
      pageRank(edges, "src_id", "nbr_id", prIterations),
      labelPropagation(edges,
        emb.filter(col(idCol) % seedEvery === 0).select(col(idCol), col(labelCol)),
        "src_id", "nbr_id", idCol, labelCol, lpIterations))
    val deg = edges.groupBy(col("src_id").as("id"))
      .agg(count("*").as("out_degree"))
    pr.join(lp, "id").join(deg, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        col("rank_nanos"), col("label"))
  }

  /** One label-propagation round — the per-iteration plan the cluster
    * pays (the public entry checkpoints its result, so plan audits
    * must look HERE): source-keyed vote join, map-side-combined
    * (dst, label) count, (dst)-keyed max-struct arg-max — never a
    * window. `labels` carries (id, seed_label, label); seeds stay
    * clamped via the coalesce, no per-round seed join.
    * Package-private test seam.
    */
  private[graft] def labelPropRound(e: DataFrame, labels: DataFrame): DataFrame = {
    val votes = e.join(labels.select(col("id").as("src"), col("label")), "src")
      .filter(col("label").isNotNull)
      .groupBy(col("dst").as("id"), col("label"))
      .agg(count("*").as("cnt"))
    val mode = votes.groupBy("id")
      .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
      .select(col("id"), (-col("m.neg")).as("mode_label"))
    labels.join(mode, Seq("id"), "left")
      .select(col("id"), col("seed_label"),
        coalesce(col("seed_label"), col("mode_label"), col("label")).as("label"))
  }
}
