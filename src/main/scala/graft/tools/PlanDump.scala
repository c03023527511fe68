package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed physical plan of named `SparkEntry.queries`
  * entries at sf0.001 — the generator behind PLANS.md entries.
  *
  * Usage: sbt "runMain graft.tools.PlanDump dedup_containment evt_attribution"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <query> [query ...]")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"=== $n")
      println(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
