package graft.tools

/** Out-of-JVM host evidence for the pipeline forensics (r13 verdict
  * #1). The r12/r13 driver runs hit a 16–27× per-image CPU inflation
  * while EVERY in-JVM forensic (gc_ms, jit_ms, task retries, loopback
  * counters) read healthy — so "host contention" was a diagnosis by
  * elimination. These probes measure OUTSIDE the JVM, making the
  * remaining hypotheses distinguishable from the artifact alone:
  *
  *  - [[cpuStat]] — whole-host jiffy counters from `/proc/stat`,
  *    including STEAL (cycles the hypervisor ran someone else while
  *    this guest was runnable — charged to the guest's processes by
  *    some accounting paths); deltas bracket each attempt.
  *  - [[schedstat]] — `/proc/self/schedstat`: this process' on-CPU
  *    nanoseconds and RUNQUEUE-WAIT nanoseconds (runnable but not
  *    running). A big wait delta with healthy in-JVM counters is
  *    direct evidence of host-level core contention.
  *  - [[cpuMhz]] — mean of `/proc/cpuinfo`'s "cpu MHz" lines: a
  *    frequency-scaling snapshot (a down-clocked window inflates
  *    cycles-per-second-normalized CPU time on every process).
  *  - [[HostCanary]] — the decisive instrument: a FIXED xorshift
  *    workload running concurrently with the attempt in a separate
  *    OS process (its own JVM — no shared heap, code cache, or
  *    compiler state with the Spark JVM). If the host is the
  *    mechanism, the canary's ns-per-chunk inflates with the
  *    pipeline; if the Spark JVM deoptimized, the canary stays at
  *    baseline while exec-CPU inflates. Decision rule:
  *    [[PipelineMeter.adjudicate]].
  *
  * All readers return sentinels (None / empty stats) off-Linux or on
  * read failure — the forensics fields then carry −1, never a fake 0.
  */
object HostProbe {

  /** Aggregate "cpu " line of /proc/stat, USER_HZ jiffies since boot.
    * Field order per proc(5): user nice system idle iowait irq
    * softirq steal guest guest_nice (trailing fields may be absent on
    * old kernels — missing reads as 0).
    */
  final case class CpuStat(user: Long, nice: Long, system: Long, idle: Long,
      iowait: Long, irq: Long, softirq: Long, steal: Long) {
    def total: Long = user + nice + system + idle + iowait + irq + softirq + steal
    def busy: Long = total - idle - iowait
  }

  def cpuStat(): Option[CpuStat] =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu "))
      line.map { l =>
        val f = l.split("\\s+").drop(1).map(s => try s.toLong catch { case _: Throwable => 0L })
        def at(i: Int) = if (i < f.length) f(i) else 0L
        CpuStat(at(0), at(1), at(2), at(3), at(4), at(5), at(6), at(7))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** /proc/self/schedstat: (on-CPU ns, runqueue-wait ns, timeslices). */
  def schedstat(): Option[(Long, Long, Long)] =
    try {
      val f = scala.io.Source.fromFile("/proc/self/schedstat").mkString.trim.split("\\s+")
      if (f.length >= 3) Some((f(0).toLong, f(1).toLong, f(2).toLong)) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Mean of /proc/cpuinfo "cpu MHz" lines (current per-core
    * frequency snapshot), None when the field is absent.
    */
  def cpuMhz(): Option[Double] =
    try {
      val vals = scala.io.Source.fromFile("/proc/cpuinfo").getLines()
        .filter(_.startsWith("cpu MHz")).flatMap { l =>
          l.split(":").lastOption.flatMap(s =>
            try Some(s.trim.toDouble) catch { case _: Throwable => None })
        }.toSeq
      if (vals.nonEmpty) Some(vals.sum / vals.size) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** USER_HZ is 100 on every mainstream Linux ABI: jiffies → ms. */
  val JiffyMs = 10L

  /** Canary result. `mode` records how the fixed workload ran:
    * "process" (separate JVM — the real out-of-JVM instrument),
    * "thread" (in-JVM daemon thread fallback when spawning failed;
    * still separates host from task-thread pathology but shares the
    * JVM), "none" (no chunks completed — attempt too short or spawn
    * and fallback both failed).
    */
  final case class CanaryStats(mode: String, chunks: Int,
      medianNs: Long, minNs: Long, maxNs: Long)
}

/** The fixed-work canary child process: runs the same xorshift chunk
  * forever, printing nanoseconds-per-chunk, one line per chunk. The
  * PARENT brackets a pipeline attempt with start/stop and reads the
  * per-chunk times that landed during the attempt ([[HostCanary]]).
  * A chunk of 2²⁶ xorshift steps runs ~25–60 ms on this class of
  * host — 100+ samples per pipeline attempt, fine-grained enough to
  * see a throttle window open and close.
  */
object CanaryProcess {
  val ChunkIters: Long = 1L << 26

  /** The chunk, shared verbatim by child, fallback thread, and
    * [[graft.Bench.cpuProbe]]'s loop shape. Returns garbage that the
    * caller must consume (dead-code-elimination defeat).
    */
  def chunk(iters: Long, seed: Long): Long = {
    var x = 0x9e3779b97f4a7c15L + seed
    var k = 0L
    while (k < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; k += 1 }
    x
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toLong else ChunkIters
    var sink = 0L
    var i = 0L
    while (true) {
      val t0 = System.nanoTime()
      sink ^= chunk(iters, i)
      val ns = System.nanoTime() - t0
      // stdout is line-buffered through println+flush; parent reads
      println(ns)
      System.out.flush()
      if (sink == 42L) System.err.println("") // keep `sink` live
      i += 1
    }
  }
}

/** Parent-side handle: start at attempt begin, stop at attempt end.
  * Spawns [[CanaryProcess]] in its own tiny JVM (−Xmx32m, serial GC —
  * nothing to collect) using this JVM's own java binary and
  * classpath; falls back to an in-JVM daemon thread when the spawn
  * fails (e.g. classpath not materialized under a non-forked runner).
  * The first `warmupSkip` chunks are excluded from stats — a fresh
  * JVM interprets the loop before OSR-compiling it, and that cost is
  * the child's, not the host's.
  */
final class HostCanary(chunkIters: Long = CanaryProcess.ChunkIters,
    warmupSkip: Int = 2) {
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  @volatile private var mode = "none"
  private var proc: Option[Process] = None
  private var fallbackStop = new java.util.concurrent.atomic.AtomicBoolean(false)

  locally {
    val spawned =
      try {
        val javaBin = java.nio.file.Paths.get(
          System.getProperty("java.home"), "bin", "java").toString
        val cp = System.getProperty("java.class.path")
        val haveMain = cp != null && cp.nonEmpty
        if (!haveMain) None
        else {
          val pb = new ProcessBuilder(javaBin, "-Xmx32m", "-XX:+UseSerialGC",
            "-cp", cp, "graft.tools.CanaryProcess", chunkIters.toString)
          pb.redirectErrorStream(false)
          val p = pb.start()
          val reader = new Thread(() => {
            try {
              val br = new java.io.BufferedReader(
                new java.io.InputStreamReader(p.getInputStream))
              var line = br.readLine()
              while (line != null) {
                try samples.add(java.lang.Long.valueOf(line.trim))
                catch { case _: NumberFormatException => }
                line = br.readLine()
              }
            } catch { case scala.util.control.NonFatal(_) => }
          })
          reader.setDaemon(true)
          reader.start()
          Some(p)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    spawned match {
      case Some(p) =>
        proc = Some(p); mode = "process"
      case None =>
        // in-JVM fallback: still a fixed workload on a non-Spark
        // thread, but shares the JVM (weaker separator — recorded)
        val t = new Thread(() => {
          var i = 0L
          var sink = 0L
          while (!fallbackStop.get()) {
            val t0 = System.nanoTime()
            sink ^= CanaryProcess.chunk(chunkIters, i)
            samples.add(java.lang.Long.valueOf(System.nanoTime() - t0))
            if (sink == 42L) System.err.println("")
            i += 1
          }
        })
        t.setDaemon(true)
        t.start()
        mode = "thread"
    }
  }

  /** Kill the child / stop the fallback thread and fold the chunks
    * that landed while the attempt ran into stats. A child that
    * produced fewer than `warmupSkip`+1 chunks reports mode "none"
    * (nothing measurable — never a fake number).
    */
  def stop(): HostProbe.CanaryStats = {
    proc.foreach { p => try { p.destroyForcibly(); () } catch { case _: Throwable => } }
    fallbackStop.set(true)
    import scala.jdk.CollectionConverters._
    val all = samples.iterator().asScala.map(_.longValue()).toArray
    val usable = all.drop(warmupSkip)
    if (usable.isEmpty) HostProbe.CanaryStats("none", 0, -1L, -1L, -1L)
    else {
      val sorted = usable.sorted
      HostProbe.CanaryStats(mode, sorted.length,
        sorted(sorted.length / 2), sorted.head, sorted.last)
    }
  }
}
