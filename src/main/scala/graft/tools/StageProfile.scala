package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-timeline profiler for one registered query: prints every
  * stage's (submit, complete, task-time, name) plus the DRIVER GAPS —
  * wall intervals where zero stages were running. The heavy bench
  * queries measure wall ≫ Σtask/32 with zero spill (QueryProfile), so
  * the question this answers is WHERE the un-tasked wall goes:
  * between-stage gaps = driver planning / AQE re-optimization /
  * scheduling, not executor work.
  *
  * Usage: sbt "runMain graft.tools.StageProfile <dir> <query> [query...]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <dir> <query> [query ...]")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, submit: Long, done: Long, taskMs: Long, nTasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    val taskMsByStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          taskMsByStage.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(te.taskMetrics.executorRunTime)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n'),
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          Option(taskMsByStage.get(si.stageId)).map(_.get).getOrElse(0L),
          si.numTasks))
      }
    })
    def drain(): Unit =
      try org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      catch { case _: Throwable => Thread.sleep(300) }

    for (n <- args.drop(1)) {
      stages.clear(); taskMsByStage.clear(); drain()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      drain()
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(_.submit)
      val base = if (ss.nonEmpty) ss.map(_.submit).min else 0L
      println(s"=== $n wall=${wallMs.round} ms, ${ss.size} stages, " +
        s"sum_task_ms=${ss.map(_.taskMs).sum}")
      var cursor = base
      var gapTotal = 0L
      for (s <- ss) {
        val gap = s.submit - cursor
        if (gap > 0) gapTotal += gap
        println(f"  [${s.submit - base}%6d +${s.done - s.submit}%5d ms] gapBefore=${math.max(gap, 0)}%5d stage ${s.id}%3d tasks=${s.nTasks}%3d taskMs=${s.taskMs}%6d ${s.name.take(60)}")
        cursor = math.max(cursor, s.done)
      }
      val tail = wallMs.toLong - (cursor - base)
      println(s"  total inter-stage gap=${gapTotal} ms, head+tail outside stages=${tail} ms")
    }
    spark.stop()
  }
}
