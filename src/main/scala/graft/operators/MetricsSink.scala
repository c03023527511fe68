package graft.operators

/** Structured metrics event — the counter set the reference forwards
  * to its external telemetry service (wandb, `logger.py:119-141`):
  * totals, success/failure splits, rates.
  *
  * `phase` is `"progress"` (throttled, during the run — failure
  * SPLITS are unknown mid-run, hence `None`) or `"final"` (once per
  * pipeline run, after stats aggregation — authoritative counters,
  * identical to [[graft.Pipeline.Result]]).
  */
case class MetricsEvent(
    phase: String,
    count: Long,
    successes: Long,
    failedToDownload: Option[Long],
    failedToResize: Option[Long],
    imgPerSec: Double,
    successRate: Double,
    elapsedSec: Double)

/** K8 telemetry parity without the external dependency: the reference
  * ships counters to wandb; here the same counters flow to (a) a
  * pluggable in-process hook — point it at any metrics client — and
  * (b) an optional driver-local JSON-lines file
  * (`DownloadConfig.metricsJsonlPath`), one event per line, the
  * machine-readable sibling of the human console line.
  *
  * Telemetry must never fail the run: hook exceptions and file I/O
  * errors are swallowed (the reference's wandb wrapper catches and
  * warns identically in spirit).
  */
object MetricsSink {

  /** Pluggable hook; default no-op. Set by the embedding application
    * (the wandb-equivalent integration point).
    */
  @volatile var hook: MetricsEvent => Unit = _ => ()

  private def f(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  def json(e: MetricsEvent): String =
    s"""{"phase":"${e.phase}","count":${e.count},"successes":${e.successes},""" +
      s""""failed_to_download":${e.failedToDownload.map(_.toString).getOrElse("null")},""" +
      s""""failed_to_resize":${e.failedToResize.map(_.toString).getOrElse("null")},""" +
      s""""img_per_sec":${f(e.imgPerSec)},"success_rate":${f(e.successRate)},""" +
      s""""elapsed_sec":${f(e.elapsedSec)}}"""

  /** Emit to the hook and, when configured, append one JSON line to
    * the driver-local metrics file.
    */
  def emit(e: MetricsEvent, jsonlPath: Option[String] = None): Unit = {
    try hook(e) catch { case scala.util.control.NonFatal(_) => }
    jsonlPath.foreach { p =>
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p),
          (json(e) + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case scala.util.control.NonFatal(_) => }
    }
  }
}
