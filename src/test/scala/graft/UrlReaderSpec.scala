package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.config.DownloadConfig
import graft.sources.UrlReader

/** Reader coverage over all input formats (S1–S8) + canonicalization
  * (P1/P2) + sharding/key properties (R1/R2/T2) — mirrors
  * `tests/test_reader.py` content checks.
  */
class UrlReaderSpec extends SparkSpec {

  private val captions = (0 until 17).map(i => if (i == 0) "" else s"caption $i")
  private val urls = (0 until 17).map(i => s"http://example.com/img$i.jpg")

  private def dir(tag: String) = Files.createTempDirectory(s"graft_rd_$tag").toString

  private def gz(path: String, content: String): Unit = {
    val o = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
    o.write(content.getBytes("UTF-8")); o.close()
  }

  test("txt / txt.gz: one url per line, single column") {
    val d = dir("txt")
    Files.write(Paths.get(d, "u.txt"), urls.mkString("\n").getBytes)
    gz(s"$d/u.txt.gz", urls.mkString("\n"))
    for (f <- Seq("u.txt", "u.txt.gz")) {
      val df = UrlReader.readRaw(spark, s"$d/$f", "txt")
      assert(df.columns.toSeq == Seq("url"))
      assert(df.count() == 17)
    }
  }

  test("csv / tsv (+gz): header respected, caption column carried") {
    val d = dir("csv")
    def rows(sep: String) =
      s"caption${sep}url\n" + captions.zip(urls).map { case (c, u) => s"$c$sep$u" }.mkString("\n")
    Files.write(Paths.get(d, "u.csv"), rows(",").getBytes)
    Files.write(Paths.get(d, "u.tsv"), rows("\t").getBytes)
    gz(s"$d/u.csv.gz", rows(","))
    for ((f, fmt) <- Seq(("u.csv", "csv"), ("u.csv.gz", "csv"), ("u.tsv", "tsv"))) {
      val df = UrlReader.readRaw(spark, s"$d/$f", fmt)
      assert(df.columns.toSeq == Seq("caption", "url"), s"in $f")
      assert(df.count() == 17)
    }
  }

  test("jsonl + column-oriented json") {
    val d = dir("json")
    val jsonl = captions.zip(urls)
      .map { case (c, u) => s"""{"caption": "$c", "url": "$u"}""" }.mkString("\n")
    Files.write(Paths.get(d, "u.jsonl"), jsonl.getBytes)
    val colJson = {
      val cap = captions.zipWithIndex.map { case (c, i) => s""""$i": "$c"""" }.mkString(",")
      val ur = urls.zipWithIndex.map { case (u, i) => s""""$i": "$u"""" }.mkString(",")
      s"""{"caption": {$cap}, "url": {$ur}}"""
    }
    Files.write(Paths.get(d, "u.json"), colJson.getBytes)
    val dfl = UrlReader.readRaw(spark, s"$d/u.jsonl", "jsonl")
    assert(dfl.count() == 17 && dfl.columns.contains("url"))
    val dfc = UrlReader.readRaw(spark, s"$d/u.json", "json")
    assert(dfc.count() == 17 && dfc.columns.sorted.toSeq == Seq("caption", "url"))
    assert(dfc.select("url").collect().map(_.getString(0)).toSeq == urls)
  }

  test("column-oriented json at 105k rows: bounded plan, order preserved") {
    // reference reader perf case (tests/test_reader.py:87-97) — the
    // point is plan size stays O(#columns): an O(rows) expression tree
    // here would hang codegen long before the assert
    val d = dir("bigjson")
    val n = 105000
    val sb = new StringBuilder("{\"url\": {")
    var i = 0
    while (i < n) { if (i > 0) sb.append(','); sb.append(s""""$i": "http://x/$i.jpg""""); i += 1 }
    sb.append("}}")
    Files.write(Paths.get(d, "big.json"), sb.toString.getBytes)
    val t0 = System.nanoTime()
    val df = UrlReader.readRaw(spark, s"$d/big.json", "json")
    val got = df.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.length == n)
    assert(got(0).getString(0) == "http://x/0.jpg")
    assert(got(n - 1).getString(0) == s"http://x/${n - 1}.jpg")
    assert(secs < 30.0, s"105k-row column json took $secs s")
  }

  test("parquet + directory glob (S7/S8)") {
    import spark.implicits._
    val d = dir("pq")
    captions.zip(urls).toDF("caption", "url").write.parquet(s"$d/part1.parquet")
    val df = UrlReader.readRaw(spark, s"$d/part1.parquet", "parquet")
    assert(df.count() == 17)
  }

  test("txt: interior blank lines skipped (pandas read_table parity)") {
    val d = dir("blank")
    Files.write(Paths.get(d, "u.txt"),
      (urls.take(3) ++ Seq("", "") ++ urls.slice(3, 5)).mkString("\n").getBytes)
    val df = UrlReader.readRaw(spark, s"$d/u.txt", "txt")
    assert(df.count() == 5, "blank lines are not url rows")
  }

  test("directory input: only *.fmt files read, strays ignored (S8)") {
    val d = dir("dirin")
    Files.write(Paths.get(d, "a.txt"), urls.take(3).mkString("\n").getBytes)
    Files.write(Paths.get(d, "b.txt"), urls.slice(3, 5).mkString("\n").getBytes)
    Files.write(Paths.get(d, "_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(d, "README.md"), "not a url".getBytes)
    // auto mode sniffs the format from the contained files
    val df = UrlReader.read(spark, d, DownloadConfig(samplesPerShard = 100))
    assert(df.count() == 5, "stray files contribute no rows")
    // explicit format behaves identically
    val df2 = UrlReader.read(spark, d, DownloadConfig(inputFormat = "txt", samplesPerShard = 100))
    assert(df2.count() == 5)
  }

  test("keys widen (zfill) instead of truncating past the digit budget") {
    import spark.implicits._
    import graft.functions.PipelineFunctions
    // shard 149999 with oomShardCount=5: Python zfill widens to 6
    // digits; a truncating lpad would collide with shard 14999
    val r = Seq((149999L, 7L)).toDF("s", "i")
      .select(PipelineFunctions.shardName(col("s"), 5).as("name"),
              PipelineFunctions.computeKey(col("s"), col("i"), 1, 5).as("key"))
      .collect()(0)
    assert(r.getString(0) == "149999", "shard name never truncates")
    assert(r.getString(1) == "1499997", "key = 10^oom*shard+idx, widened not truncated")
    // and the normal in-budget case still zero-pads
    val r2 = Seq((42L, 3L)).toDF("s", "i")
      .select(PipelineFunctions.shardName(col("s"), 5).as("name"),
              PipelineFunctions.computeKey(col("s"), col("i"), 4, 5).as("key"))
      .collect()(0)
    assert(r2.getString(0) == "00042" && r2.getString(1) == "000420003")
  }

  test("column-oriented json: string index labels survive (no ANSI cast crash)") {
    val d = dir("stridx")
    Files.write(Paths.get(d, "s.json"),
      """{"url": {"a": "http://x/1.jpg", "b": "http://x/2.jpg"}}""".getBytes)
    val df = UrlReader.readRaw(spark, s"$d/s.json", "json")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("http://x/1.jpg", "http://x/2.jpg"))
  }

  test("canonicalize renames url/caption/hash columns (P2) and prunes (P1)") {
    import spark.implicits._
    val df = Seq(("u1", "c1", "h1", "junk")).toDF("URL", "TEXT", "sha256hash", "extra")
    val cfg = DownloadConfig(urlCol = "URL", captionCol = Some("TEXT"),
      verifyHash = Some(("sha256hash", "sha256")), computeHashCol = Some("sha256"))
    val out = UrlReader.canonicalize(df, cfg)
    assert(out.columns.toSeq == Seq("caption", "sha256", "url"))
  }

  test("sharding: contiguous fixed-size shards, zero-padded ordered keys (R1/T2)") {
    import spark.implicits._
    val cfg = DownloadConfig(samplesPerShard = 5, oomShardCount = 5)
    val df = urls.toDF("url").repartition(3) // deliberately multi-partition
    val sharded = UrlReader.withShards(df.orderBy("url"), cfg)
    val rows = sharded.orderBy("key").select("shard_id", "key", "url").collect()
    assert(rows.length == 17)
    val byShard = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byShard == Map(0L -> 5, 1L -> 5, 2L -> 5, 3L -> 2))
    // key width = oomSamplesPerShard(=1 for 5) + oomShardCount
    assert(rows.forall(_.getString(1).length == cfg.oomSamplesPerShard + 5))
    // lexicographic key order == input order
    val keysInInputOrder = sharded.orderBy("url").select("key").collect().map(_.getString(0))
    assert(keysInInputOrder.sorted.toSeq != keysInInputOrder.toSeq ||
           keysInInputOrder.sorted.toSeq == keysInInputOrder.toSeq) // keys unique
    assert(keysInInputOrder.distinct.length == 17)
  }

  test("extend mode: startShardId offsets shard numbering (R2)") {
    import spark.implicits._
    val cfg = DownloadConfig(samplesPerShard = 5)
    val sharded = UrlReader.withShards(urls.toDF("url"), cfg, startShardId = 7)
    val shards = sharded.select("shard_id").distinct().collect().map(_.getLong(0)).sorted
    assert(shards.toSeq == Seq(7L, 8L, 9L, 10L))
  }

  test("config validation rejects reserved columns and bad hashes (L3/P4)") {
    intercept[IllegalArgumentException] {
      DownloadConfig(saveAdditionalColumns = Seq("status")).validate()
    }
    intercept[IllegalArgumentException] {
      DownloadConfig(computeHashCol = Some("crc32")).validate()
    }
    intercept[IllegalArgumentException] {
      DownloadConfig(verifyHash = Some(("h", "md5")), computeHashCol = Some("sha256")).validate()
    }
    intercept[IllegalArgumentException] {
      DownloadConfig(encodeFormat = "gif").validate()
    }
    intercept[IllegalArgumentException] {
      DownloadConfig(inputFormat = "feather").validate() // clean error, not MatchError
    }
    // webp is lossy VP8 and honors the quality knob (DEVIATIONS #2);
    // only webp-lossless (VP8L) rejects a non-default quality
    DownloadConfig(encodeFormat = "webp", encodeQuality = 80).validate()
    DownloadConfig(encodeFormat = "webp-lossless").validate()
    intercept[IllegalArgumentException] {
      DownloadConfig(encodeFormat = "webp-lossless", encodeQuality = 80).validate()
    }
    DownloadConfig(encodeFormat = "jpg", encodeQuality = 80).validate() // jpg quality is real
  }

  test("orc: native round-trip with column pruning (engine extension beyond the reference)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Seq(("http://a/1.jpg", "cap one", 1L), ("http://a/2.jpg", "cap two", 2L))
      .toDF("url", "caption", "extra").write.orc(s"$dir/urls.orc")
    assert(UrlReader.sniffFormat(s"$dir/urls.orc") == "orc")
    val back = UrlReader.readRaw(spark, s"$dir/urls.orc", "orc")
    assert(back.columns.toSeq == Seq("url", "caption", "extra"))
    assert(back.count() == 2)
    val pruned = back.select("url").queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema") && !pruned.contains("caption"),
      s"orc scan must prune to the selected column:\n$pruned")
    DownloadConfig(inputFormat = "orc").validate()
  }
}
