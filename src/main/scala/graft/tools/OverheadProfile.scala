package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Fixed-overhead decomposition for the sub-2 s bench tier (r15
  * optimization target): per query, split the bench-shape cost
  * (construction + `.count()`, the exact timed region of Bench.scala)
  * into
  *   - t_construct: query construction (incl. parquet listing/footer
  *     reads, per-transformation analysis, and any eager
  *     checkpoints the operator runs internally),
  *   - t_count: the timed action,
  *   - jobs/stages launched, Σ task time, and the wall NOT covered by
  *     any running stage (driver gap: planning + AQE re-optimization
  *     + scheduling).
  * Two passes per query (bench methodology), both reported — pass 2
  * shows the warm-codegen/warm-metadata shape the bench min actually
  * keeps.
  *
  * Usage: sbt "runMain graft.tools.OverheadProfile <dir> <query> [query...]"
  */
object OverheadProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OverheadProfile <dir> <query> [query ...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(submit: Long, done: Long, taskMs: Long, nTasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMsByStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          taskMsByStage.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(te.taskMetrics.executorRunTime)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add(St(si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          Option(taskMsByStage.get(si.stageId)).map(_.get).getOrElse(0L), si.numTasks))
      }
    })
    def drain(): Unit =
      try org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      catch { case _: Throwable => Thread.sleep(300) }

    // warm-up (bench methodology)
    try graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    catch { case _: Throwable => }

    import scala.jdk.CollectionConverters._
    def phase[A](body: => A): (A, Double, Int, Int, Long, Double) = {
      drain(); stages.clear(); taskMsByStage.clear(); jobs.set(0)
      val t0 = System.nanoTime()
      val r = body
      val wallMs = (System.nanoTime() - t0) / 1e6
      drain()
      val ss = stages.asScala.toSeq.sortBy(_.submit)
      // union of stage intervals = wall covered by at least one stage
      var covered = 0L
      var cursor = 0L
      for (s <- ss) {
        val a = math.max(s.submit, cursor)
        if (s.done > a) { covered += s.done - a; cursor = s.done }
        cursor = math.max(cursor, s.done)
      }
      (r, wallMs, jobs.get(), ss.size, ss.map(_.taskMs).sum, wallMs - covered)
    }

    println("query,pass,construct_ms,count_ms,jobs_c,stages_c,taskms_c,gap_c,jobs_a,stages_a,taskms_a,gap_a")
    for (n <- args.drop(1); pass <- 1 to 2) {
      val fn = graft.SparkEntry.queries(n)
      val (df, cMs, jc, sc, tc, gc) = phase { fn(spark, dir) }
      val (_, aMs, ja, sa, ta, ga) = phase { try df.count() catch { case _: Throwable => -1L } }
      println(f"$n,$pass,${cMs}%.0f,${aMs}%.0f,$jc,$sc,$tc,${gc}%.0f,$ja,$sa,$ta,${ga}%.0f")
    }
    spark.stop()
  }
}
