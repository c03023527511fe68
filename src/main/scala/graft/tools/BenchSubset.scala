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
    def onePass(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case _: Throwable => }
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = onePass(); val p2 = onePass()
    def f3(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val rows = names.map(n => s""""$n":${f3(math.min(p1(n), p2(n)))}""")
    println(s"""{"bench_subset":{${rows.mkString(",")}},"dir":"$dir"}""")
    spark.stop()
  }
}
