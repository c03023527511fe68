package graft.sinks

import java.io.{BufferedOutputStream, OutputStream}
import java.util.zip.CRC32C

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.config.DownloadConfig
import graft.functions.PipelineFunctions
import graft.util.SerializableHadoopConf

/** Output sinks (SURVEY §2.7) with exact per-shard file naming.
  *
  * All per-sample sinks follow the same scalable shape: the frame is
  * hash-partitioned by `shard_id` (a shard never splits across tasks),
  * sorted within partitions by (shard_id, key), and `foreachPartition`
  * streams rows shard-by-shard into exactly one output object per
  * shard (`{shard:%05d}.tar` / `.tfrecord` / a `{shard:%05d}/`
  * directory) — one open file per task at a time, the reference's
  * disk-friendly streaming property (README.md:354-357). I/O goes
  * through the Hadoop FileSystem API, so any supported scheme
  * (file://, hdfs://, s3a://) works — the S9 fsspec analog.
  *
  * Sink invariants (mirrored from the reference tests): a metadata
  * parquet sidecar per shard with rows = input rows incl. failures;
  * payloads written only for successes; tar/files/tfrecord named by
  * zero-padded shard id.
  */
object Sinks {

  /** Columns every sink consumes; `metaJson` is prebuilt by the
    * pipeline with `to_json(struct(metaCols))` so sinks never
    * serialize rows themselves.
    */
  case class SinkInput(df: DataFrame, cfg: DownloadConfig)

  /** Non-cached FileSystem with checksum sidecars disabled
    * (LocalFileSystem otherwise writes a .crc sibling per created file
    * — doubling file-count overhead in the per-sample sinks).
    * `newInstance` instead of the cached `getFileSystem`: the
    * checksum setters MUTATE the FileSystem object, and the JVM-wide
    * cached instance is shared with every other write in the process
    * (parquet sidecars, checkpoints), which would silently lose their
    * .crc generation. Callers must `close()` the returned instance.
    *
    * `conf` is the driver's session Hadoop conf (spark.hadoop.* —
    * object-store credentials, fs.defaultFS), shipped to executors
    * via [[SerializableHadoopConf]]: a bare `new Configuration()`
    * here would resolve the WRONG filesystem on s3a/gcs.
    */
  private def fs(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    val f = FileSystem.newInstance(p.toUri, conf)
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    (f, p)
  }

  /** Session conf captured on the driver, serializable into task
    * closures. Call on the DRIVER (uses `df.sparkSession`).
    */
  private def sessionConf(df: DataFrame): SerializableHadoopConf =
    new SerializableHadoopConf(df.sparkSession.sessionState.newHadoopConf())

  /** Stream a partition's rows (sorted by shard_id) through a
    * per-shard writer lifecycle: `onShardStart(shard)` →
    * `onRow(row)`* → `onShardEnd()` per run of equal shard ids.
    * Single pass, O(1) memory — never buffers a shard.
    */
  private def groupedByShard(rows: Iterator[Row], shardIdx: Int)(
      onShardStart: Long => Unit, onRow: Row => Unit, onShardEnd: () => Unit): Unit = {
    var current = Long.MinValue
    var open = false
    rows.foreach { r =>
      val s = r.getLong(shardIdx)
      if (!open || s != current) {
        if (open) onShardEnd()
        onShardStart(s); current = s; open = true
      }
      onRow(r)
    }
    if (open) onShardEnd()
  }

  private def shardStem(shard: Long, oom: Int): String =
    ("%0" + oom + "d").format(shard)

  private def prep(df: DataFrame): DataFrame =
    df.repartition(col("shard_id")).sortWithinPartitions("shard_id", "key")

  /** K1/K2: per-shard metadata parquet `{shard:%05d}.parquet`
    * (payload column included by the parquet output format, K2).
    * Implementation: native Spark parquet write partitioned by shard,
    * then a rename pass to the exact reference naming that runs ON
    * EXECUTORS — the driver does exactly one directory listing; the
    * O(#shards) per-shard list + rename calls (each a full copy on an
    * object store) are distributed, so ~10⁷ shards at 100 TB don't
    * serialize through one thread.
    */
  def writeMetaParquet(df: DataFrame, outDir: String, cfg: DownloadConfig): Unit = {
    val tmp = outDir + "/_meta_tmp"
    df.repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(tmp)
    val sconf = sessionConf(df)
    val (hfs, _) = fs(outDir, sconf.value)
    try {
    val shardDirs = hfs.listStatus(new Path(tmp)).filter(_.isDirectory).map { st =>
      val name = st.getPath.getName // shard_id=N
      (st.getPath.toString, name.substring(name.indexOf('=') + 1).toLong)
    }.toSeq
    val (dir, oom) = (outDir, cfg.oomShardCount)
    val sc = df.sparkSession.sparkContext
    val slices = math.max(1, math.min(shardDirs.length, sc.defaultParallelism * 4))
    sc.parallelize(shardDirs, slices).foreachPartition { it =>
      val efs = new Path(dir).getFileSystem(sconf.value)
      it.foreach { case (src, shard) =>
        val part = efs.listStatus(new Path(src)).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
        part.foreach { p =>
          val dest = new Path(dir, shardStem(shard, oom) + ".parquet")
          // Hadoop rename returns false if dest exists (e.g. a crashed
          // prior attempt) — replace it, never keep stale data silently.
          if (efs.exists(dest)) efs.delete(dest, false)
          require(efs.rename(p, dest), s"rename $p -> $dest failed")
        }
      }
    }
    hfs.delete(new Path(tmp), true)
    } finally hfs.close()
  }

  /** K3: webdataset tar — entries `{key}.jpg`, `{key}.txt`,
    * `{key}.json` per successful sample, one `{shard:%05d}.tar` per
    * shard (writer.py:94-135; layout per webdataset.github.io).
    */
  def writeWebdataset(df: DataFrame, outDir: String, cfg: DownloadConfig): Unit = {
    val d = prep(df)
    val si = d.schema.fieldIndex("shard_id"); val ki = d.schema.fieldIndex("key")
    val pi = d.schema.fieldIndex("_final_payload"); val ci = d.schema.fieldIndex("_caption_out")
    val mi = d.schema.fieldIndex("_meta_json"); val sti = d.schema.fieldIndex("status")
    // reference save_caption semantics (writer.py:118-127): a caption
    // COLUMN present means every sample gets a .txt entry — a NULL
    // caption writes "" rather than dropping the member, keeping the
    // per-sample field set uniform for webdataset loaders
    val saveCaption = d.columns.contains("caption")
    val (ext, oom, dir) = (cfg.payloadExt, cfg.oomShardCount, outDir)
    val sconf = sessionConf(d)
    d.foreachPartition { (rows: Iterator[Row]) =>
      val (hfs, _) = fs(dir, sconf.value)
      try {
        var out: TarArchiveOutputStream = null
        def entry(name: String, bytes: Array[Byte]): Unit = {
          val e = new TarArchiveEntry(name)
          e.setSize(bytes.length)
          out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
        }
        groupedByShard(rows, si)(
          shard => {
            out = new TarArchiveOutputStream(new BufferedOutputStream(
              hfs.create(new Path(dir, shardStem(shard, oom) + ".tar"), true), 1 << 20))
            out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          },
          r => if (r.getString(sti) == "success" && !r.isNullAt(pi)) {
            val key = r.getString(ki)
            entry(s"$key.$ext", r.getAs[Array[Byte]](pi))
            if (saveCaption)
              entry(s"$key.txt",
                (if (r.isNullAt(ci)) "" else r.getString(ci)).getBytes("UTF-8"))
            entry(s"$key.json", r.getString(mi).getBytes("UTF-8"))
          },
          () => out.close())
      } finally hfs.close()
    }
  }

  /** K4: one file triple per sample under `{shard:%05d}/`
    * (writer.py:246-293).
    */
  def writeFiles(df: DataFrame, outDir: String, cfg: DownloadConfig): Unit = {
    val d = prep(df)
    val si = d.schema.fieldIndex("shard_id"); val ki = d.schema.fieldIndex("key")
    val pi = d.schema.fieldIndex("_final_payload"); val ci = d.schema.fieldIndex("_caption_out")
    val mi = d.schema.fieldIndex("_meta_json"); val sti = d.schema.fieldIndex("status")
    val saveCaption = d.columns.contains("caption") // see writeWebdataset
    val (ext, oom, dir) = (cfg.payloadExt, cfg.oomShardCount, outDir)
    val sconf = sessionConf(d)
    d.foreachPartition { (rows: Iterator[Row]) =>
      val (hfs, _) = fs(dir, sconf.value)
      try {
        var shardDir: Path = null
        def put(name: String, bytes: Array[Byte]): Unit = {
          val o = hfs.create(new Path(shardDir, name), true)
          o.write(bytes); o.close()
        }
        groupedByShard(rows, si)(
          shard => { shardDir = new Path(dir, shardStem(shard, oom)); hfs.mkdirs(shardDir) },
          r => if (r.getString(sti) == "success" && !r.isNullAt(pi)) {
            val key = r.getString(ki)
            put(s"$key.$ext", r.getAs[Array[Byte]](pi))
            if (saveCaption)
              put(s"$key.txt",
                (if (r.isNullAt(ci)) "" else r.getString(ci)).getBytes("UTF-8"))
            put(s"$key.json", r.getString(mi).getBytes("UTF-8"))
          },
          () => ())
      } finally hfs.close()
    }
  }

  /** K5: TFRecord of TF `Example` protos, one `{shard:%05d}.tfrecord`
    * per shard (writer.py:138-243). Protobuf and the TFRecord framing
    * (length + masked CRC32C) are encoded from scratch — see
    * [[TfRecordCodec]] — so no TF dependency is needed.
    *
    * Feature layout matches the reference exactly (writer.py:186-243):
    * the payload under the encode-format key, `key` as bytes, the
    * caption under `"txt"` when a caption column is configured, and
    * EVERY metadata column as its own TYPED feature — int-likes →
    * int64_list, float/double → float_list, arrays → the list form of
    * their element type, everything else (and any NULL, matching the
    * reference's value-typed `_feature(None)` → `b""`) → bytes_list.
    */
  def writeTfrecord(df: DataFrame, outDir: String, cfg: DownloadConfig,
                    metaCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    val d = prep(df)
    val si = d.schema.fieldIndex("shard_id"); val ki = d.schema.fieldIndex("key")
    val pi = d.schema.fieldIndex("_final_payload"); val ci = d.schema.fieldIndex("_caption_out")
    val sti = d.schema.fieldIndex("status")
    // caption presence in the SCHEMA is the reference's save_caption
    // flag: a present-but-NULL caption still writes txt = "".
    val saveCaption = d.columns.contains("caption")
    val metaFields: Seq[(String, Int, DataType)] =
      metaCols.filterNot(_ == "key").map(c => (c, d.schema.fieldIndex(c), d.schema(c).dataType))
    val (ext, oom, dir) = (cfg.payloadExt, cfg.oomShardCount, outDir)
    val sconf = sessionConf(d)
    d.foreachPartition { (rows: Iterator[Row]) =>
      val (hfs, _) = fs(dir, sconf.value)
      try {
        var out: BufferedOutputStream = null
        groupedByShard(rows, si)(
          shard => out = new BufferedOutputStream(
            hfs.create(new Path(dir, shardStem(shard, oom) + ".tfrecord"), true), 1 << 20),
          r => if (r.getString(sti) == "success" && !r.isNullAt(pi)) {
            val feats =
              Seq("key" -> TfRecordCodec.bytesFeature(r.getString(ki).getBytes("UTF-8")),
                  ext -> TfRecordCodec.bytesFeature(r.getAs[Array[Byte]](pi))) ++
              (if (saveCaption)
                 Seq("txt" -> TfRecordCodec.bytesFeature(
                   (if (r.isNullAt(ci)) "" else r.getString(ci)).getBytes("UTF-8")))
               else Nil) ++
              metaFields.map { case (name, i, dt) => name -> TfRecordCodec.typedFeature(r, i, dt) }
            TfRecordCodec.writeRecord(out, TfRecordCodec.example(feats))
          },
          () => out.close())
      } finally hfs.close()
    }
  }

  // K6 (dummy/benchmark mode) is routed by Pipeline through
  // writeMetaParquet rather than a pure no-op: the metadata sidecars
  // are the stats source AND the incremental-resume marker, so even
  // benchmark runs keep them (DEVIATIONS #10). There is deliberately
  // no discard writer here — a dead `noop` method would only suggest
  // a path that never executes.
}

/** Hand-rolled TF `Example` protobuf + TFRecord framing (T15/K5).
  * Wire format per the public protobuf spec and TFRecord layout:
  * `[len:uint64le][masked_crc32c(len):uint32le][data][masked_crc32c(data)]`.
  */
object TfRecordCodec {

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def lenDelim(field: Int, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    varint(out, (field << 3) | 2); varint(out, bytes.length); out.write(bytes)
    out.toByteArray
  }

  /** Feature { bytes_list = 1 { repeated bytes value = 1 } } */
  def bytesFeature(value: Array[Byte]): Array[Byte] =
    lenDelim(1, lenDelim(1, value))

  /** bytes_list with multiple values (the reference's list-of-str
    * meta columns, writer.py:229-243).
    */
  def bytesListFeature(values: Seq[Array[Byte]]): Array[Byte] =
    lenDelim(1, values.map(lenDelim(1, _)).foldLeft(Array.emptyByteArray)(_ ++ _))

  /** Spark-typed row value → TF feature, mirroring the reference's
    * value-type dispatch (writer.py:204-243): int-likes → int64_list,
    * float/double → float_list, arrays → the list feature of their
    * element type, everything else → bytes_list. A NULL of ANY type
    * becomes an empty bytes_list — the reference types by VALUE, so
    * `_feature(None)` is `bytes_list(b"")` even for int columns.
    */
  def typedFeature(r: Row, i: Int, dt: org.apache.spark.sql.types.DataType): Array[Byte] = {
    import org.apache.spark.sql.types._
    if (r.isNullAt(i)) bytesFeature(Array.emptyByteArray)
    else dt match {
      case BooleanType => int64Feature(Seq(if (r.getBoolean(i)) 1L else 0L))
      case ByteType    => int64Feature(Seq(r.getByte(i).toLong))
      case ShortType   => int64Feature(Seq(r.getShort(i).toLong))
      case IntegerType => int64Feature(Seq(r.getInt(i).toLong))
      case LongType    => int64Feature(Seq(r.getLong(i)))
      case FloatType   => floatFeature(Seq(r.getFloat(i)))
      case DoubleType  => floatFeature(Seq(r.getDouble(i).toFloat))
      case BinaryType  => bytesFeature(r.getAs[Array[Byte]](i))
      case ArrayType(et, _) =>
        val vs = r.getSeq[Any](i)
        // NULL elements inside typed lists: TF's Int64List/FloatList
        // cannot represent null (the reference CRASHES here — a None
        // inside a typed meta list raises in protobuf); map to 0
        // rather than killing the sink task
        et match {
          case ByteType | ShortType | IntegerType | LongType | BooleanType =>
            int64Feature(vs.map {
              case null => 0L
              case b: Boolean => if (b) 1L else 0L
              case n: Number => n.longValue()
            })
          case FloatType | DoubleType =>
            floatFeature(vs.map {
              case null => 0.0f
              case n: Number => n.floatValue()
            })
          case _ =>
            bytesListFeature(vs.map(v =>
              (if (v == null) "" else v.toString).getBytes("UTF-8")))
        }
      case _ => bytesFeature(r.get(i).toString.getBytes("UTF-8"))
    }
  }

  /** Feature { float_list = 2 { repeated float value = 1, packed } } */
  def floatFeature(values: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(values.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putFloat)
    lenDelim(2, lenDelim(1, bb.array()))
  }

  /** Feature { int64_list = 3 { repeated int64 value = 1, packed } } */
  def int64Feature(values: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    values.foreach(varint(out, _))
    lenDelim(3, lenDelim(1, out.toByteArray))
  }

  /** Example { features = 1 { map<string,Feature> feature = 1 } } */
  def example(features: Seq[(String, Array[Byte])]): Array[Byte] = {
    val entries = features.map { case (name, feat) =>
      lenDelim(1, lenDelim(1, name.getBytes("UTF-8")) ++ lenDelim(2, feat))
    }
    lenDelim(1, entries.foldLeft(Array.emptyByteArray)(_ ++ _))
  }

  private[graft] def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C(); c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  def writeRecord(out: OutputStream, data: Array[Byte]): Unit = {
    val lenBuf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    val word = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.write(lenBuf)
    out.write(word.clear().putInt(maskedCrc(lenBuf)).array())
    out.write(data)
    out.write(word.clear().putInt(maskedCrc(data)).array())
  }
}
