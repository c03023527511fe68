package graft

import org.apache.spark.sql.SparkSession

import graft.config.DownloadConfig

/** CLI entry point mirroring the reference's `download()` keyword
  * surface (`main.py:73-112`, CLI via fire at `main.py:277-278`):
  * `--key=value` / `--key value` flags with the reference's parameter
  * names, mapped onto [[DownloadConfig]] + [[Pipeline.download]].
  *
  * Scheduling knobs that Spark subsumes (`processes_count`,
  * `distributor`, `subjob_size`, `max_shard_retry`) are accepted and
  * ignored with a note — a user's existing invocation keeps working.
  * `enable_wandb`/`wandb_project` are rejected (external service, out
  * of scope). Interpolation names (`upscale_interpolation`,
  * `downscale_interpolation`) are accepted and ignored: the JVM path
  * picks bicubic-up/bilinear-down (DEVIATIONS #1).
  *
  * Example:
  * {{{
  * spark-submit --class graft.Main graft.jar \
  *   --url_list=urls.txt --output_folder=/out \
  *   --output_format=webdataset --image_size=256 --encode_format=jpg
  * }}}
  */
object Main {

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"expected --key=value or --key value, got: $a")
      val body = a.stripPrefix("--")
      val eq = body.indexOf('=')
      if (eq >= 0) { out(body.substring(0, eq)) = body.substring(eq + 1); i += 1 }
      else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out(body) = args(i + 1); i += 2
      } else { out(body) = "true"; i += 1 } // bare flag
    }
    out.toMap
  }

  private val Ignored = Set(
    "processes_count", "distributor", "subjob_size", "max_shard_retry")

  /** Reference kwargs → DownloadConfig. Throws on unknown keys. */
  def configFrom(kv: Map[String, String]): DownloadConfig = {
    var cfg = DownloadConfig()
    def b(v: String): Boolean = v.toLowerCase == "true"
    def list(v: String): Seq[String] =
      v.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    kv.foreach {
      case (k, _) if Ignored.contains(k) => // Spark subsumes / DEVIATIONS #1
      case ("url_list", _) | ("output_folder", _) => // handled by main
      // the fire CLI's `None` sentinel = "keep the default" for every
      // optional EXCEPT compute_hash, where an explicit None disables
      // the (defaulted-on) hash column
      case (k, "None") if k != "compute_hash" =>
      case ("image_size", v) => cfg = cfg.copy(imageSize = v.toInt)
      case ("resize_mode", v) => cfg = cfg.copy(resizeMode = v)
      case ("upscale_interpolation", v) => cfg = cfg.copy(upscaleInterpolation = v)
      case ("downscale_interpolation", v) => cfg = cfg.copy(downscaleInterpolation = v)
      case ("resize_only_if_bigger", v) => cfg = cfg.copy(resizeOnlyIfBigger = b(v))
      case ("encode_quality", v) => cfg = cfg.copy(encodeQuality = v.toInt)
      case ("encode_format", v) => cfg = cfg.copy(encodeFormat = v)
      case ("skip_reencode", v) => cfg = cfg.copy(skipReencode = b(v))
      case ("output_format", v) => cfg = cfg.copy(outputFormat = v)
      case ("input_format", v) => cfg = cfg.copy(inputFormat = v)
      case ("url_col", v) => cfg = cfg.copy(urlCol = v)
      case ("caption_col", v) => cfg = cfg.copy(captionCol = Some(v))
      case ("bbox_col", v) => cfg = cfg.copy(bboxCol = Some(v))
      case ("thread_count", v) => cfg = cfg.copy(threadCount = v.toInt)
      case ("number_sample_per_shard", v) => cfg = cfg.copy(samplesPerShard = v.toInt)
      case ("extract_exif", v) => cfg = cfg.copy(extractExif = b(v))
      case ("save_additional_columns", v) => cfg = cfg.copy(saveAdditionalColumns = list(v))
      case ("timeout", v) => cfg = cfg.copy(timeoutSeconds = v.toInt)
      case ("oom_shard_count", v) => cfg = cfg.copy(oomShardCount = v.toInt)
      case ("compute_hash", v) =>
        cfg = cfg.copy(computeHashCol = if (v == "None" || v.isEmpty) None else Some(v))
      case ("verify_hash", v) => // reference: [col, type]
        val Seq(c, t) = list(v)
        cfg = cfg.copy(verifyHash = Some((c, t)))
      case ("retries", v) => cfg = cfg.copy(retries = v.toInt)
      case ("disable_all_reencoding", v) => cfg = cfg.copy(disableAllReencoding = b(v))
      case ("min_image_size", v) => cfg = cfg.copy(minImageSize = v.toInt)
      case ("max_image_area", v) => cfg = cfg.copy(maxImageArea = v.toDouble)
      case ("max_aspect_ratio", v) => cfg = cfg.copy(maxAspectRatio = v.toDouble)
      case ("incremental_mode", v) => cfg = cfg.copy(incrementalMode = v)
      case ("user_agent_token", v) => cfg = cfg.copy(userAgentToken = Some(v))
      case ("disallowed_header_directives", v) =>
        cfg = cfg.copy(disallowedHeaderDirectives = list(v))
      case ("ignore_ssl_certificate", v) => cfg = cfg.copy(ignoreSslCertificate = b(v))
      case ("enable_wandb", v) if b(v) =>
        throw new IllegalArgumentException(
          "enable_wandb is not supported (external telemetry service); " +
          "use --metrics_jsonl_path (structured JSON-lines events) or the " +
          "live console progress + stats sidecars")
      case ("enable_wandb", _) | ("wandb_project", _) =>
      // wandb-parity surface: same counters, no external service
      case ("metrics_jsonl_path", v) => cfg = cfg.copy(metricsJsonlPath = Some(v))
      case (k, _) => throw new IllegalArgumentException(s"unknown option: --$k")
    }
    cfg
  }

  def main(args: Array[String]): Unit = {
    val kv = parseArgs(args)
    val urlList = kv.getOrElse("url_list",
      throw new IllegalArgumentException("--url_list is required"))
    val outDir = kv.getOrElse("output_folder", "images")
    val cfg = configFrom(kv).validate()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .appName("graft-download")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val res = Pipeline.download(spark, urlList, outDir, cfg)
      println(s"done: count=${res.count} successes=${res.successes} " +
        s"failed_to_download=${res.failedToDownload} failed_to_resize=${res.failedToResize}")
    } finally spark.stop()
  }
}
