package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.config.DownloadConfig
import graft.functions.PipelineFunctions

/** URL-list source: scan dispatch (S1–S9), canonical projection/rename
  * (P1/P2), and fixed-size contiguous sharding (R1/R2 + key synthesis
  * T2). Replaces the reference's `reader.py` wholesale — there are no
  * tmp feather shard files: Spark partitions ARE the shards.
  *
  * Scale notes:
  *  - every format is a native Spark source (pushdown/pruning apply;
  *    `.gz` decompression is automatic);
  *  - sharding uses `RDD.zipWithIndex` (one count pass + one pass with
  *    per-partition offsets) — contiguous global indices with NO
  *    single-partition window, so it holds at any input size;
  *  - after shard assignment the data is `repartition(shard_id)` so
  *    one downstream task processes one-or-more whole shards.
  */
object UrlReader {

  /** Sniff format from path extension — reader.py:95-120 dispatch. */
  def sniffFormat(path: String): String = {
    val p = path.stripSuffix(".gz")
    p.substring(p.lastIndexOf('.') + 1) match {
      case "txt" => "txt"
      case "csv" => "csv"
      case "tsv" => "tsv"
      case "json" => "json"
      case "jsonl" => "jsonl"
      case "parquet" => "parquet"
      case "orc" => "orc"
      case other => throw new IllegalArgumentException(s"unsupported input format: $other")
    }
  }

  /** S1–S8: read one file/glob in the given format. */
  def readRaw(spark: SparkSession, path: String, format: String): DataFrame = format match {
    case "txt" =>
      // pandas read_table skips blank lines by default: an interior
      // blank line must not become an empty-url row (it would shift
      // every later row's global index/shard/key off the reference's)
      spark.read.text(path).toDF("url").filter(length(col("url")) > 0)         // S1/S2
    case "csv" => spark.read.option("header", "true").csv(path)                // S3
    case "tsv" => spark.read.option("header", "true").option("sep", "\t").csv(path) // S4
    case "jsonl" => spark.read.json(path)                                      // S6
    case "json" => readColumnOrientedJson(spark, path)                         // S5
    case "parquet" => spark.read.parquet(path)                                 // S7
    // beyond the reference: ORC ships in spark-sql (native reader,
    // same projection/predicate pushdown class as parquet)
    case "orc" => spark.read.orc(path)
    case other => throw new IllegalArgumentException(
      s"unsupported input format: $other (expected one of ${DownloadConfig.ValidInputFormats})")
  }

  /** S5: pandas column-oriented JSON `{"caption":{"0":…},"url":{"0":…}}`
    * — one object whose fields are column→(rowIndex→value) maps.
    *
    * Scale shape: the file is parsed ONCE with `from_json` into
    * `map<string,map<string,string>>`, exploded to (col, idx, value)
    * triples, and pivoted back to rows with a plain hash-shuffle keyed
    * by row index. Plan size is O(#columns), independent of row count
    * — the previous formulation built one struct literal per input ROW
    * into a single `array(...)` expression, which blows codegen and
    * driver memory at the reference's own 105k-row reader test
    * (`tests/test_reader.py:87-97`). Values surface as strings (like a
    * url list read from csv/txt); multiple files keep their own row
    * order via `input_file_name`.
    */
  private def readColumnOrientedJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val whole = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("__f"),
        from_json(col("value"), MapType(StringType, MapType(StringType, StringType))).as("m"))
    // ONE validation action for malformed-check + column discovery —
    // each action re-parses the wholetext JSON, so don't spend two.
    val info = whole.agg(
      coalesce(sum(when(col("m").isNull, 1L).otherwise(0L)), lit(0L)).as("bad"),
      array_distinct(flatten(collect_list(map_keys(col("m"))))).as("cols")).collect()(0)
    if (info.getLong(0) > 0) throw new IllegalArgumentException(
      s"not column-oriented JSON: $path")
    val colNames = info.getSeq[String](1).sorted
    require(colNames.nonEmpty, s"empty column-oriented JSON: $path")
    val triples = whole
      .select(col("__f"), explode(col("m")).as(Seq("c", "im")))
      .select(col("__f"), col("c"), explode(col("im")).as(Seq("__idx", "v")))
    // Group on the RAW index label (a long cast would merge distinct
    // labels like '0'/'00' and, under ANSI mode, THROW on pandas
    // string index labels); order numerically when the labels are
    // numeric (the to_json default), lexicographically otherwise.
    triples
      .groupBy(col("__f"), col("__idx"))
      .pivot("c", colNames).agg(first("v"))
      .orderBy(col("__f"), expr("try_cast(__idx AS BIGINT)").asc_nulls_last, col("__idx"))
      .drop("__f", "__idx")
  }

  /** P1/P2: rename user columns to canonical names and keep only
    * [additional…, caption?, verifyHash?, url] — reader.py:66-79,124-133.
    */
  def canonicalize(df: DataFrame, cfg: DownloadConfig): DataFrame = {
    var d = df
    if (cfg.urlCol != "url") d = d.withColumnRenamed(cfg.urlCol, "url")
    cfg.captionCol.filter(_ != "caption").foreach { c => d = d.withColumnRenamed(c, "caption") }
    cfg.verifyHash.foreach { case (inCol, tpe) =>
      if (inCol != tpe) d = d.withColumnRenamed(inCol, tpe)
    }
    val keep = (cfg.saveAdditionalColumns ++
      cfg.bboxCol.toSeq ++
      cfg.captionCol.map(_ => "caption").toSeq ++
      cfg.verifyHash.map(_._2).toSeq :+ "url").distinct
    d.select(keep.map(col): _*)
  }

  /** R1/R2 + T2: contiguous fixed-size shards over the (ordered) input
    * with zero-padded sample keys, starting at `startShardId` (extend
    * mode resumes from the max existing id + 1 — reader.py:196-212).
    */
  def withShards(df: DataFrame, cfg: DownloadConfig, startShardId: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("__gidx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    indexed
      .withColumn("shard_id",
        PipelineFunctions.shardId(col("__gidx"), cfg.samplesPerShard) + startShardId)
      .withColumn("__idx_in_shard",
        col("__gidx") - (col("shard_id") - startShardId) * cfg.samplesPerShard)
      .withColumn("key", PipelineFunctions.computeKey(
        col("shard_id"), col("__idx_in_shard"), cfg.oomSamplesPerShard, cfg.oomShardCount))
      .drop("__gidx", "__idx_in_shard")
  }

  /** Full read: dispatch → canonicalize → shard → repartition so each
    * task owns whole shards. Directory inputs glob `*.format` sorted
    * (S8) — Spark's file listing is sorted by path.
    *
    * The repartition uses an EXPLICIT partition count (= shard count):
    * each input row expands ~1000× downstream (url → image bytes) and
    * does heavy I/O+CPU, so AQE's byte-based coalescing of the tiny
    * url shuffle would collapse the download stage onto a few tasks.
    * Pinning tasks to shards is exactly the reference's execution
    * model (one worker task per shard, R5).
    */
  def read(spark: SparkSession, path: String, cfg: DownloadConfig,
           startShardId: Long = 0L): DataFrame =
    readWithCache(spark, path, cfg, startShardId)._1

  /** [[read]] plus the CACHED url frame backing it: the cache pins
    * block-manager storage until explicitly released, so long-lived
    * sessions (repeated pipeline runs) must `unpersist()` it once the
    * materializing write has consumed the urls — `Pipeline.download`
    * does. `read` alone is fine for one-shot/test use.
    */
  def readWithCache(spark: SparkSession, path: String, cfg: DownloadConfig,
                    startShardId: Long = 0L): (DataFrame, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a glob path (dir/*.txt) is handed to Spark as-is, never probed
    val isDir = !path.exists(c => "*?[{".contains(c)) &&
      scala.util.Try(fs.getFileStatus(p).isDirectory).getOrElse(false)
    val fmt =
      if (cfg.inputFormat != "auto") cfg.inputFormat
      else if (!isDir) sniffFormat(path)
      else {
        // directory in auto mode: sniff from the contained files
        val known = fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
          .flatMap(n => scala.util.Try(sniffFormat(n)).toOption)
        require(known.nonEmpty, s"no recognizable url-list files in directory: $path")
        require(known.distinct.length == 1,
          s"directory mixes url-list formats ${known.distinct.mkString(", ")}: " +
          "pass inputFormat explicitly")
        known.head
      }
    // S8: directory inputs read ONLY `*.fmt` (+ .gz) — a stray
    // _SUCCESS / README / stats sidecar must not become url rows.
    // Spark's file listing is path-sorted, preserving order.
    val src =
      if (isDir) s"${path.stripSuffix("/")}/*.{$fmt,$fmt.gz}"
      else path
    val raw = readRaw(spark, src, fmt)
    // The url frame is read three times (shard-count, zipWithIndex's
    // offset pass, the data pass) — cache it; it is O(input list),
    // tiny next to the payloads it fans out to, and this matters for
    // non-splittable gzipped inputs.
    val canonical = canonicalize(raw, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nShards = math.max(
      math.ceil(canonical.count().toDouble / cfg.samplesPerShard).toInt, 1)
    val sharded = withShards(canonical, cfg, startShardId)
    (sharded.repartition(nShards, col("shard_id")), canonical)
  }
}
