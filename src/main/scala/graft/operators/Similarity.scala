package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    set against the corpus; one corpus scan, no corpus shuffle.
  *  - [[ivfTopK]]        — IVF-style scale path: partition the corpus
  *    into cells around centroids; probe only `nProbe` cells per query,
  *    scanning ~nProbe/nCells of the corpus.
  *
  * Scale design: the corpus never self-joins. Brute force is
  * O(|Q|·|C|) compute but a single pass over C (the |Q| side is
  * broadcast); IVF cuts the scanned fraction and the cell assignment
  * is itself a broadcast join (centroids are tiny). Top-k per query
  * uses a window over the per-query slice — the shuffle key is
  * query_id, so it scales with queries, not corpus.
  */
object Similarity {

  /** Turn a scored pair frame into per-query top-k via the bounded
    * -heap aggregate ([[graft.plans.TopKByScore]]): map-side partial
    * top-k means the shuffle carries ≤ k·partitions rows per query —
    * NOT the full scored set, which is what a Window+row_number plan
    * would shuffle and sort. Order (score desc, id asc) is identical
    * to the window formulation, bit-for-bit.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.plans.TopKByScore.topKByScore(col("cosine"), col("corpus_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("query_id"), col("t.id").as("corpus_id"),
              col("t.score").as("cosine"), (col("r") + 1).as("rank"))

  /** Exact top-k by cosine: every (query, corpus) pair scored, k best
    * kept per query. `queries` must be small enough to broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN. Centroids are taken deterministically
    * from the corpus (every |C|/nCells-th vector by id — at real scale
    * substitute a k-means pass; the plumbing is identical). Corpus
    * vectors are assigned to their nearest centroid once (broadcast
    * join + `min_by`, no corpus shuffle besides the final bucketing);
    * each query probes its `nProbe` nearest cells.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))

    // Deterministic centroid sample: rank corpus by id, take every n-th.
    val n = c.count()
    val stride = math.max(n / nCells, 1L)
    val w = Window.orderBy("corpus_id")
    val centroids = c.withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") % stride === 0).limit(nCells)
      .select(col("rn").as("cell_id"), col("cv").as("centroid"))

    // Assign each corpus vector to its nearest centroid (broadcast).
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("cv"), col("cell_id"), sqDist(col("cv"), col("centroid")).as("d"))
      .groupBy("corpus_id", "cv")
      .agg(min_by(col("cell_id"), col("d")).as("cell_id"))

    // Each query probes its nProbe nearest cells.
    val wq = Window.partitionBy("query_id").orderBy(col("d").asc, col("cell_id").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell_id"), sqDist(col("qv"), col("centroid")).as("d"))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "cell_id")

    // Score only within probed cells.
    val scored = assigned.join(broadcast(probes), "cell_id")
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cosine"))
    topKPerQuery(scored, k)
  }
}
