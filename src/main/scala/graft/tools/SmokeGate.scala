package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query wall-time smoke gate — the check that would have caught
  * round 7's winnowing regression (two queries green on correctness at
  * sf0.01 but 300× over budget at sf0.1, which timed out the whole
  * driver bench).
  *
  * Runs EVERY `SparkEntry.queries` entry once against `args(0)`
  * (an sf dir, normally sf0.1) with a per-query wall budget
  * (`args(1)` seconds, default 60), executing each plan fully via the
  * noop sink (no result IO, no driver collect). A query that breaches
  * the budget has its Spark jobs cancelled (job-group cancel) and the
  * run continues, so one bomb cannot mask another. Each query runs on
  * its OWN single-thread executor: a timed-out task that ignores the
  * job-group cancel keeps only its own (abandoned) thread, it cannot
  * steal the worker from subsequent queries — and the per-query clock
  * starts when the task actually begins running, never at submit, so a
  * stuck predecessor can't inflate a successor's reading.
  *
  * A second, global wall budget (`args(2)` seconds, default 600) fails
  * the run fast under a pervasive slowdown: once total elapsed exceeds
  * it, remaining queries are recorded as `SKIPPED_BUDGET` and the gate
  * exits nonzero. Exit code 1 when any query breaches, errors, or is
  * budget-skipped; per-query seconds printed sorted slowest-first plus
  * a single trailing JSON line for tooling.
  *
  * Usage: sbt "runMain graft.tools.SmokeGate /root/testdata/sf0.1 60 600"
  * Subset via SPARK_GRAFT_ONLY=a,b,c (same contract as Verify).
  */
object SmokeGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SmokeGate <sfDir> [timeoutSec] [totalBudgetSec]")
    val sfDir = args(0)
    val timeoutSec = if (args.length > 1) args(1).toInt else 60
    val totalBudgetSec = if (args.length > 2) args(2).toInt else 600
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, String)]
    val runStart = System.nanoTime()
    def totalElapsedSec: Double = (System.nanoTime() - runStart) / 1e9

    graft.SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        if (totalElapsedSec > totalBudgetSec) {
          results += ((name, 0.0, "SKIPPED_BUDGET"))
          println(f"[smoke] $name%-28s ${0.0}%8.2f s  SKIPPED_BUDGET")
        } else {
          val (sec, status) = QueryRunner.runWithBudget(
              spark, s"smoke-$name", name, timeoutSec, "smoke") {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          results += ((name, sec, status))
          println(f"[smoke] $name%-28s ${sec}%8.2f s  $status")
        }
      }

    val bad = results.filter(_._3 != "ok")
    println("[smoke] slowest 10:")
    results.sortBy(-_._2).take(10).foreach { case (n, s, st) =>
      println(f"[smoke]   $n%-28s ${s}%8.2f s  $st")
    }
    val json = results.sortBy(-_._2)
      .map { case (n, s, st) => s""""$n":{"sec":${f"$s%.2f"},"status":"$st"}""" }
      .mkString("{", ",", "}")
    println(s"""{"smoke_gate":{"sf_dir":"$sfDir","timeout_sec":$timeoutSec,"total_budget_sec":$totalBudgetSec,"total_sec":${f"$totalElapsedSec%.2f"},"breaches":${bad.size},"queries":$json}}""")
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[smoke] FAILED: ${bad.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
