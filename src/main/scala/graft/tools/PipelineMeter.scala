package graft.tools

import org.apache.spark.sql.SparkSession

/** Machine-independent regression accounting for the
  * download→resize→package pipeline, and the baseline gate over it.
  *
  * The 168-query surface is guarded by [[ShuffleMeter]]'s shuffle-byte
  * baseline, but the headline pipeline is mapPartitions+sink with
  * almost no shuffle — its wall img/s swings 25%+ with host throttle
  * on identical code (round 10 measured 2,560→1,898 img/s across runs
  * of the same commit), so nothing mechanical guarded it. CPU TIME
  * does not accumulate while a core is stolen: a throttled host
  * stretches the wall but charges (nearly) the same cycles per image,
  * while a genuine regression — an extra encode pass, a listener in
  * the hot loop, sha recomputed twice — charges more cycles per image
  * on every host. So the gate compares per-image CPU, not wall.
  *
  * Three per-run metrics, each normalized per SUCCESSFUL image:
  *  - `proc_cpu_us_per_img` — whole-JVM process CPU (covers the
  *    downloader's internal thread pool, GC, and sink writers, which
  *    task-level `executorCpuTime` cannot see); the primary gate.
  *  - `exec_cpu_us_per_img` — task-thread CPU from task metrics (the
  *    decode/resize/encode/hash hot path runs on the task thread);
  *    the sharper signal for hot-path regressions, recorded + gated.
  *  - `out_bytes_per_img` — bytes on disk under the output dir;
  *    two-sided: ballooning output means redundant artifacts,
  *    SHRINKING output means images silently not written.
  *
  * Residual machine-dependence, accepted: CPU frequency scaling can
  * shift cycles-per-second ~±20% across hosts — covered by the 1.4×
  * ratio; unlike wall, a 15–50× starvation window (ROUND4.md) cannot
  * touch these numbers.
  */
object PipelineMeter {

  /** Gate: breach above baseline × 1.4 (CPU and bytes), and below
    * baseline ÷ 1.4 for the two-sided out-bytes metrics. The small
    * absolute floor only silences degenerate near-zero baselines on
    * the HIGH side — applying it low would let a sub-floor baseline
    * (the parquet path's 66 bytes/img) shrink to near zero without
    * tripping, which is exactly the "images silently not written"
    * case the low side exists for; output bytes are deterministic
    * per image, so the ratio alone gates shrinkage.
    */
  val RatioTolerance = 1.4
  val AbsFloor: Long = 64

  /** One measured pipeline run. `successes` is the per-image
    * denominator: failed fetches cost little CPU and would dilute the
    * signal if counted.
    */
  final case class PipeMeasure(images: Long, successes: Long, wallSecs: Double,
      execCpuNs: Long, procCpuNs: Long, outBytes: Long) {
    private def per(v: Long): Long = if (successes <= 0) 0L else v / successes
    def execCpuUsPerImg: Long = per(execCpuNs / 1000)
    /** −1 when the platform CPU bean was unavailable ([[processCpuNs]])
      * — a loud sentinel, NOT 0: a 0 here would silently pass the
      * upward-only CPU gate and could be persisted as a degenerate
      * baseline that never trips again.
      */
    def procCpuUsPerImg: Long = if (procCpuNs < 0) -1L else per(procCpuNs / 1000)
    def outBytesPerImg: Long = per(outBytes)
    def imgPerSec: Double = if (wallSecs <= 0) 0.0 else images / wallSecs
  }

  /** Attach a task-level listener summing `executorCpuTime` (ns).
    * Same bracketing discipline as [[ShuffleMeter.attach]]: runs must
    * be sequential, the counter is global to the context.
    */
  def attachExecutorCpu(spark: SparkSession): () => Long = {
    val total = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) total.addAndGet(m.executorCpuTime)
      }
    })
    () => total.get()
  }

  /** Whole-JVM CPU time (ns since JVM start), −1 if the platform bean
    * is unavailable. In local mode the executors ARE this JVM, so the
    * delta around a run covers pool threads/GC/sinks too.
    */
  def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Total bytes of regular files under `path` (0 if absent). */
  def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => java.nio.file.Files.isRegularFile(p))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
  }

  /** Bracket one pipeline run: drains the listener bus before and
    * after so every finished task's CPU has landed, then reads the
    * output dir size. `run` returns (images, successes).
    */
  def measure(spark: SparkSession, execCpuRead: () => Long, outDir: String)
             (run: => (Long, Long)): PipeMeasure = {
    def drain(): Unit =
      try org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      catch { case _: Throwable => Thread.sleep(300) }
    drain()
    val e0 = execCpuRead(); val p0 = processCpuNs(); val t0 = System.nanoTime()
    val (images, successes) = run
    val wall = (System.nanoTime() - t0) / 1e9
    drain()
    val p1 = processCpuNs()
    // metric-unavailable propagates as −1, never as a 0 delta
    val procDelta = if (p0 < 0 || p1 < 0) -1L else p1 - p0
    PipeMeasure(images, successes, wall,
      execCpuRead() - e0, procDelta, dirBytes(outDir))
  }

  /** The pure gate. CPU metrics breach only UPWARD (less CPU per
    * image is an improvement); `*_out_bytes_per_img` metrics breach
    * in BOTH directions (shrunken output = images silently dropped).
    * The absolute floor applies to the HIGH side only: a low-side
    * floor would disarm the shrink gate for any baseline under ~10×
    * the floor (66 bytes/img parquet meta could drop to 1 silently).
    * Unavailable metrics (−1 sentinel) are skipped, never gated or
    * baselined. Returns (breaches, newMetrics) with
    * [[ShuffleMeter.Breach]]'s shape — for a low-side breach
    * `ratio` < 1.
    */
  def check(measured: Map[String, Long], baseline: Map[String, Long],
            ratio: Double = RatioTolerance,
            floor: Long = AbsFloor): (Seq[ShuffleMeter.Breach], Seq[String]) = {
    val newM = measured.keys.filterNot(baseline.contains).toSeq.sorted
    val breaches = measured.toSeq.collect {
      case (name, v) if v >= 0 && baseline.contains(name) && baseline(name) >= 0 && {
        val b = baseline(name)
        val high = v > b * ratio && v > b + floor
        val low = name.endsWith("out_bytes_per_img") && v < b / ratio
        high || low
      } => ShuffleMeter.Breach(name, v, baseline(name))
    }.sortBy(b => -math.max(b.ratio, if (b.bytes == 0) Double.PositiveInfinity
      else b.baseline.toDouble / b.bytes))
    (breaches, newM)
  }

  val BaselinePath: java.nio.file.Path =
    java.nio.file.Paths.get("tools/pipeline_baseline.json")
}
