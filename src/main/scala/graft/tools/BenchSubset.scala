package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-methodology subset timer: times named queries with the EXACT
  * Bench.scala shape — same session conf, an untimed q1_agg warm-up,
  * `.count()` as the timed action, two passes, per-query min — so
  * before/after comparisons during an optimization round measure what
  * the driver's bench measures (QueryProfile's noop sink additionally
  * pays the final ORDER BY + its range-sampling pass, which count()
  * eliminates — right for operator work, wrong for bench deltas).
  *
  * Usage: sbt "runMain graft.tools.BenchSubset <dir> <query> [query...]"
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchSubset <dir> <query> [query ...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    catch { case _: Throwable => }
    // r14-advice fix: a query that CRASHES must not masquerade as a
    // (fast) timing in before/after artifacts — track per-pass success
    // and report failed queries as -1 plus an explicit "failed" list.
    def onePass(): Map[String, (Double, Boolean)] = names.map { n =>
      val t0 = System.nanoTime()
      val ok =
        try { graft.SparkEntry.queries(n)(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench_subset] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      n -> (((System.nanoTime() - t0) / 1e9, ok))
    }.toMap
    val p1 = onePass(); val p2 = onePass()
    def f3(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def best(n: String): Option[Double] = {
      val oks = Seq(p1(n), p2(n)).collect { case (s, true) => s }
      if (oks.isEmpty) None else Some(oks.min)
    }
    val rows = names.map(n => s""""$n":${best(n).map(f3(_).toString).getOrElse("-1")}""")
    val failed = names.filter(best(_).isEmpty)
    println(s"""{"bench_subset":{${rows.mkString(",")}},"failed":[${failed.map("\"" + _ + "\"").mkString(",")}],"dir":"$dir"}""")
    spark.stop()
  }
}
