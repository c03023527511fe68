package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.DownloadConfig
import graft.operators.{Blurrer, DownloadProgress, Downloader, ExifExtractor, Resizer, Stats}
import graft.sinks.Sinks
import graft.sources.UrlReader

/** The `download()`-equivalent end-to-end pipeline — the reference's
  * fixed logical plan (SURVEY overview) as one declarative DataFrame
  * chain:
  *
  * SCAN → PROJECT/RENAME → SHARD(key) → [anti-join done shards] →
  * MAP(download, thread-pooled) → FILTER/tag (robots, hash-verify) →
  * MAP(blur?, resize) → EXTEND(status, dims, hash, exif) →
  * SINK(files|tar|parquet|tfrecord|dummy) → AGG(stats).
  *
  * Spark plans and schedules the whole thing; there are no tmp shard
  * files, no subjob batching, no custom distributor (R3–R7 are
  * subsumed by the scheduler — SURVEY §3.3 inversion note).
  */
object Pipeline {

  case class Result(
      metaFrame: DataFrame,
      count: Long, successes: Long,
      failedToDownload: Long, failedToResize: Long,
      /** `observe()` metrics captured on the materializing write:
        * n_rows, n_success, payload_bytes. Empty if no rows ran. */
      observed: Map[String, Any] = Map.empty)

  /** Existing-output shard ids (L1 incremental / F6 anti-join input):
    * parse `{shard}_stats.json` names like `main.py:157-158`.
    */
  def doneShardIds(spark: SparkSession, outDir: String): Seq[Long] = {
    val p = new Path(outDir)
    // Session conf, not a bare new Configuration(): with s3a/gcs
    // credentials set via spark.hadoop.*, a bare conf resolves the
    // WRONG store and incremental mode silently re-downloads all.
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith("_stats.json"))
      .map(_.stripSuffix("_stats.json").toLong).toSeq
  }

  /** Full pipeline run. Returns the metadata frame (already written
    * through the configured sink) plus global counters.
    */
  def download(spark: SparkSession, inputPath: String, outDir: String,
               cfg0: DownloadConfig): Result = {
    val cfg = cfg0.validate()
    val startTime = System.currentTimeMillis() / 1000.0
    val fs = new Path(outDir).getFileSystem(spark.sessionState.newHadoopConf())

    // L1 lifecycle (main.py:151-168)
    if (cfg.incrementalMode == "overwrite") fs.delete(new Path(outDir), true)
    // Shards present BEFORE this run — excluded from this run's stats
    // and (in incremental mode) from processing.
    val preexisting = doneShardIds(spark, outDir)
    val done = cfg.incrementalMode match {
      case "incremental" => preexisting
      case _ => Nil
    }
    val startShardId = cfg.incrementalMode match {
      case "extend" => if (preexisting.isEmpty) 0L else preexisting.max + 1
      case _ => 0L
    }
    fs.mkdirs(new Path(outDir))

    // SCAN → canonicalize → shard (S1-S9, P1/P2, R1/R2, T2). The url
    // frame is cached inside the reader; release it after the
    // materializing write (long-lived sessions would otherwise
    // accumulate one pinned url cache per pipeline run).
    val (sharded, urlCache) = UrlReader.readWithCache(spark, inputPath, cfg, startShardId)

    // F6: skip already-done shards (broadcast anti-join; `done` is a
    // driver-known, small list — one stats file per finished shard).
    val pending =
      if (done.isEmpty) sharded
      else {
        import spark.implicits._
        sharded.join(broadcast(done.toDF("shard_id")), Seq("shard_id"), "left_anti")
      }

    // MAP: thread-pooled download (S11/T1/F1), with live progress (K8):
    // tasks bump accumulators; a driver daemon prints a throttled
    // count/%success/img-per-sec line while the sink job runs.
    val progress =
      if (cfg.progressIntervalMs > 0)
        Some(new DownloadProgress(spark.sparkContext, cfg.progressIntervalMs,
          cfg.metricsJsonlPath))
      else None
    val fetched = Downloader.download(pending, cfg,
      progress.map(p => (p.attempted, p.succeeded)))

    // F2: hash verify over RAW bytes (downloader.py:274-292). A NULL
    // provided hash is a MISMATCH (the reference compares the computed
    // digest against None and fails the row) — `computed =!= NULL`
    // alone would be NULL, which when() treats as false, silently
    // admitting unverified bytes.
    val verified = cfg.verifyHash match {
      case Some((_, tpe)) =>
        val computed = hashCol(col(Downloader.PayloadCol), tpe)
        fetched.withColumn("_hash_mismatch",
          col(Downloader.FetchErrorCol).isNull &&
            (col(tpe).isNull || computed =!= col(tpe)))
      case None => fetched.withColumn("_hash_mismatch", lit(false))
    }

    // T10 (optional, inside the resize decode) + T3-T9/F3-F5.
    // Raw downloaded bytes stay untouched in _payload: hash (T12) and
    // exif (T11) are computed over them, as in downloader.py:324-340.
    val resized = Resizer.resize(verified, cfg)

    // EXTEND: status, error_message, hash, exif (T11/T12)
    var meta = resized
      .withColumn("status",
        when(col(Downloader.FetchErrorCol).isNotNull, "failed_to_download")
          .when(col("_hash_mismatch"), "failed_to_download")
          .when(col("_resize_error").isNotNull, "failed_to_resize")
          .otherwise("success"))
      .withColumn("error_message",
        when(col(Downloader.FetchErrorCol).isNotNull, col(Downloader.FetchErrorCol))
          .when(col("_hash_mismatch"), "hash mismatch")
          .otherwise(col("_resize_error")))
    cfg.computeHashCol.foreach { tpe =>
      meta = meta.withColumn(tpe,
        when(col("status") === "success", hashCol(col(Downloader.PayloadCol), tpe)))
    }
    if (cfg.extractExif)
      meta = meta.withColumn("exif",
        when(col("status") === "success", ExifExtractor.exifJsonUdf(col(Downloader.PayloadCol))))

    // Final payload + caption + sidecar JSON for the sample sinks.
    val metaCols: Seq[String] =
      // P3: drop the verify-hash input column by its CANONICAL
      // (post-rename) name — i.e. the hash type; computeHashCol
      // re-adds it below with recomputed values when configured.
      (pending.columns.filterNot(c => c == "shard_id" || cfg.verifyHash.exists(_._2 == c)) ++
        Seq("key", "status", "error_message", "width", "height",
            "original_width", "original_height") ++
        (if (cfg.extractExif) Seq("exif") else Nil) ++
        cfg.computeHashCol.toSeq).distinct.filterNot(_ == "key").prepended("key")
    // observe(): free global counters riding the materializing write —
    // the batch-engine analog of the reference's live stats stream
    // (A6); no extra action, collected by the driver post-write.
    val observation = new org.apache.spark.sql.Observation(s"graft_pipeline_$startTime")
    val prepared = meta
      .withColumn("_final_payload",
        when(col("status") === "success", col("_resized_payload")))
      .withColumn("_caption_out",
        // cast: sinks getString() this column; the reference
        // stringifies non-string captions (str(caption))
        if (pending.columns.contains("caption")) col("caption").cast("string")
        else lit(null).cast("string"))
      .withColumn("_meta_json", to_json(struct(metaCols.map(col): _*)))
      .observe(observation,
        count(lit(1)).as("n_rows"),
        sum(when(col("status") === "success", 1L).otherwise(0L)).as("n_success"),
        sum(coalesce(octet_length(col("_final_payload")), lit(0))).as("payload_bytes"))

    // SINK dispatch (K1-K6) + parquet sidecar invariant.
    //
    // Exactly-once downloads by durable materialization, never by
    // block-manager caching: a cached partition that gets evicted (or
    // lost with an executor) would silently RE-DOWNLOAD on the next
    // action, so two sinks could see different bytes for the same key.
    // Instead the first write IS the materialization point:
    //  - parquet/dummy: the sidecar parquet is written straight off the
    //    pipeline (one pass); stats re-read the written sidecars.
    //  - files/webdataset/tfrecord: the pipeline lands once in a
    //    `_work_tmp` parquet checkpoint; sink, sidecar and stats all
    //    read those identical bytes; the checkpoint is then deleted.
    def sidecarOf(df: DataFrame) = df.select(
      (metaCols.map(col) :+ col("shard_id")) ++
        (if (cfg.outputFormat == "parquet")
           Seq(col("_final_payload").as(cfg.payloadExt)) else Nil): _*)
    val shardFromKey =
      floor(col("key").cast("long") / math.pow(10, cfg.oomSamplesPerShard).toLong).cast("long")
    def sidecarsExist: Boolean =
      Option(fs.globStatus(new Path(s"$outDir/*.parquet"))).exists(_.nonEmpty)
    def emptyStats: DataFrame = {
      import spark.implicits._
      Seq.empty[(Long, String, String)].toDF("shard_id", "status", "error_message")
    }
    progress.foreach(_.start())
    val statsInput: DataFrame = try { cfg.outputFormat match {
      case "parquet" | "dummy" =>
        Sinks.writeMetaParquet(sidecarOf(prepared), outDir, cfg)
        // Read-back includes prior runs' sidecars (incremental AND
        // extend modes); restrict stats to THIS run's shards. An empty
        // input writes no sidecars at all — nothing to read.
        if (!sidecarsExist) emptyStats
        else {
          val readback = spark.read.parquet(s"$outDir/*.parquet")
            .withColumn("shard_id", shardFromKey)
            .select("shard_id", "status", "error_message")
          if (preexisting.isEmpty) readback
          else {
            import spark.implicits._
            readback.join(broadcast(preexisting.toDF("shard_id")), Seq("shard_id"), "left_anti")
          }
        }
      case fmt =>
        val ckpt = s"$outDir/_work_tmp"
        // Checkpoint ONLY the columns downstream consumers read (sinks:
        // key/payload/caption/meta-json/status; sidecar: metaCols;
        // stats: shard_id/status/error_message). `prepared` still
        // carries the raw `_payload` and `_resized_payload` — writing
        // those too would roughly TRIPLE the image bytes through the
        // checkpoint for nothing (hundreds of wasted TB at 100 TB).
        val keepCols = (metaCols ++
          Seq("shard_id", "_final_payload", "_caption_out", "_meta_json",
              "status", "error_message")).distinct
        prepared.select(keepCols.map(col): _*).write.mode("overwrite").parquet(ckpt)
        val work = spark.read.parquet(ckpt)
        fmt match {
          case "files" => Sinks.writeFiles(work, outDir, cfg)
          case "webdataset" => Sinks.writeWebdataset(work, outDir, cfg)
          case "tfrecord" => Sinks.writeTfrecord(work, outDir, cfg, metaCols)
        }
        Sinks.writeMetaParquet(sidecarOf(work), outDir, cfg)
        val stats = work.select("shard_id", "status", "error_message")
        stats
    // downloads only run during the materializing write above —
    // everything after reads durable bytes. stop() in finally: a
    // failed write must not leak the poller thread (it would keep
    // emitting lines into the next run)
    } } finally {
      progress.foreach(_.stop())
      urlCache.unpersist()
    }

    // AGG: per-shard stats sidecars + global counters (A1-A7)
    val statsDf = Stats.shardStats(statsInput).cache()
    val endTime = System.currentTimeMillis() / 1000.0
    Stats.writeShardStats(statsDf, outDir, cfg.oomShardCount, startTime, endTime)
    val g = Stats.globalStats(statsDf, startTime, endTime)
    statsDf.unpersist()
    if (cfg.outputFormat != "parquet" && cfg.outputFormat != "dummy")
      fs.delete(new Path(s"$outDir/_work_tmp"), true)
    // metaFrame reads the durable sidecars — acting on it later must
    // never re-trigger downloads. Empty input → empty frame.
    // getOrEmpty (bounded wait) instead of get: an all-shards-done
    // incremental run may produce a zero-task write that never emits
    // metrics, and a blocking get would park a thread forever — the
    // old Future+Await workaround leaked exactly that thread per
    // timed-out run.
    val observed: Map[String, Any] =
      try org.apache.spark.sql.graftbridge.ObservationBridge.getOrEmpty(observation)
      catch { case scala.util.control.NonFatal(_) => Map.empty }
    val metaFrame =
      if (sidecarsExist) spark.read.parquet(s"$outDir/*.parquet")
      else spark.emptyDataFrame
    // K8 wandb-parity: the authoritative post-run counters flow to the
    // structured metrics hook + optional JSON-lines file — the same
    // numbers the reference ships to wandb (logger.py:119-141).
    val elapsed = math.max(endTime - startTime, 1e-9)
    graft.operators.MetricsSink.emit(
      graft.operators.MetricsEvent("final",
        g.getLong(0), g.getLong(1), Some(g.getLong(2)), Some(g.getLong(3)),
        g.getLong(0) / elapsed,
        if (g.getLong(0) == 0) 0.0 else g.getLong(1).toDouble / g.getLong(0),
        elapsed),
      cfg.metricsJsonlPath)
    Result(metaFrame,
      g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), observed)
  }

  private def hashCol(payload: org.apache.spark.sql.Column, tpe: String) = tpe match {
    case "md5" => md5(payload)
    case "sha256" => sha2(payload, 256)
    case "sha512" => sha2(payload, 512)
  }
}
