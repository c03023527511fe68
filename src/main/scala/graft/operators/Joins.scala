package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder — no custom planner
  * needed because the union-window formulation already has the right
  * physical shape).
  */
object Joins {

  /** As-of join: for every left row, attach the most recent right row
    * with `right.ts <= left.ts` within the same partition keys
    * (backward as-of, ties match).
    *
    * Formulation: tag sides, union, one window over
    * (partitionCols, ts, side) carrying `last(value, ignoreNulls)`
    * forward, keep left rows. ONE shuffle on the partition keys, no
    * range-join explosion, no per-key driver loop — this is the
    * at-scale shape (a sort-merge pass per key group); a native
    * `ASOF JOIN` (e.g. DuckDB's) is the single-node equivalent.
    *
    * `rightCols` maps right-side column → output name. Caveat: a right
    * row whose carried column is genuinely NULL is skipped by
    * `ignoreNulls` in favor of an older non-null value.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               partitionCols: Seq[String], tsCol: String,
               rightCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    // an output name that exists on the LEFT would poison the carried
    // window: the left row's own non-null value sits at currentRow and
    // always wins last(ignoreNulls) — silently returning left values
    val clash = rightCols.map(_._2).toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"asOfJoin output columns collide with left columns: ${clash.mkString(", ")} — " +
      "rename the right-side outputs")
    val l = left.withColumn("_side", lit(1))
    var r = right.select(
      (partitionCols :+ tsCol).map(col) ++ rightCols.map { case (c, out) => col(c).as(out) }: _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols ++ rightCols.map(_._2)).map(col): _*)
  }

  /** Range join: pair left rows with right rows whose `ts` falls in
    * `[left.ts - before, left.ts + after]` within the same keys —
    * bucketized so it stays an equi-join: both sides bucket their
    * timestamps at `granularity`, left rows explode into the covered
    * buckets, and the residual range predicate filters exactly.
    * Shuffle volume scales with range/granularity, not with
    * |left|x|right|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                partitionCols: Seq[String], tsCol: String,
                before: Long, after: Long, granularity: Long): DataFrame = {
    require(granularity > 0 && before >= 0 && after >= 0)
    // Integer `div`, not double floor-division: ns-epoch timestamps
    // (~1.7e18) exceed double's 2^53 exact range, and a 256 ns
    // rounding error at a bucket boundary would silently drop pairs.
    // Requires non-negative ts - before (true for epoch timestamps).
    val lb = left
      .withColumn("_lbucket", explode(sequence(
        expr(s"($tsCol - ${before}L) div ${granularity}L"),
        expr(s"($tsCol + ${after}L) div ${granularity}L"))))
    val rb = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("_rbucket", expr(s"r_$tsCol div ${granularity}L"))
    val cond = (partitionCols.map(c => col(c) === col(s"r_$c")) :+
      (col("_lbucket") === col("_rbucket"))).reduce(_ && _)
    lb.join(rb, cond)
      .filter(col(s"r_$tsCol") >= col(tsCol) - before && col(s"r_$tsCol") <= col(tsCol) + after)
      .drop("_lbucket", "_rbucket")
  }
}
