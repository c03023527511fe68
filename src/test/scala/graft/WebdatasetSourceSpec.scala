package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.DownloadConfig

/** DataSourceV2 round-trip: webdataset tars written by the sink read
  * back via `spark.read.format("webdataset")`, with column pruning.
  */
class WebdatasetSourceSpec extends SparkSpec {

  private lazy val server = new graft.util.HttpImageServer
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  test("round-trip: pipeline tars -> webdataset source rows") {
    val d = Files.createTempDirectory("graft_wdssrc").toString
    val rows = server.allowedUrls.zipWithIndex.map { case (u, i) => s"cap $i,$u" }
    Files.write(java.nio.file.Paths.get(d, "in.csv"),
      ("caption,url\n" + rows.mkString("\n")).getBytes)
    val out = Files.createTempDirectory("graft_wdssrc_out").toString
    Pipeline.download(spark, s"$d/in.csv", out,
      DownloadConfig(outputFormat = "webdataset", captionCol = Some("caption"),
        samplesPerShard = 5, threadCount = 8, incrementalMode = "overwrite"))

    val back = spark.read.format("webdataset").load(out)
    assert(back.columns.toSeq == Seq("shard", "key", "jpg", "txt", "json"))
    val collected = back.orderBy("key").collect()
    assert(collected.length == server.allowedUrls.length)
    assert(collected.map(_.getString(0)).distinct.sorted.toSeq == Seq("00000", "00001"))
    assert(collected.forall(r => r.getAs[Array[Byte]]("jpg").length > 100))
    assert(collected.forall(_.getString(3).startsWith("cap ")))
    assert(collected.forall(_.getString(4).contains("\"status\": \"success\"")
      || collected.forall(_.getString(4).contains("\"status\":\"success\""))))
    // join back against the parquet sidecar on key
    val sidecar = spark.read.parquet(s"$out/*.parquet")
    assert(back.join(sidecar, "key").count() == collected.length)
  }

  test("payload_ext option: png tars round-trip with a png column") {
    val d = Files.createTempDirectory("graft_wdspng").toString
    val list = java.nio.file.Paths.get(d, "u.txt")
    Files.write(list, server.allowedUrls.take(3).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft_wdspng_out").toString
    Pipeline.download(spark, list.toString, out,
      DownloadConfig(outputFormat = "webdataset", encodeFormat = "png",
        samplesPerShard = 10, threadCount = 8, incrementalMode = "overwrite"))
    val back = spark.read.format("webdataset")
      .option("payload_ext", "png").load(out)
    assert(back.columns.contains("png"))
    val payloads = back.select("png").collect().map(_.getAs[Array[Byte]](0))
    assert(payloads.length == 3 && payloads.forall(p => p != null && p.length > 100))
  }

  test("glob and single-file paths load (not only directories)") {
    val d = Files.createTempDirectory("graft_wdsglob").toString
    val list = java.nio.file.Paths.get(d, "u.txt")
    Files.write(list, server.allowedUrls.take(3).mkString("\n").getBytes)
    val out = Files.createTempDirectory("graft_wdsglob_out").toString
    Pipeline.download(spark, list.toString, out,
      DownloadConfig(outputFormat = "webdataset", samplesPerShard = 10,
        threadCount = 8, incrementalMode = "overwrite"))
    assert(spark.read.format("webdataset").load(s"$out/*.tar").count() == 3)
    assert(spark.read.format("webdataset").load(s"$out/00000.tar").count() == 3)
  }

  test("column pruning: payload not materialized when unselected") {
    val outs = Files.createTempDirectory("graft_wds_prune").toString
    val list = Files.createTempDirectory("g").resolve("u.txt")
    Files.write(list, server.allowedUrls.mkString("\n").getBytes)
    Pipeline.download(spark, list.toString, outs,
      DownloadConfig(outputFormat = "webdataset", samplesPerShard = 10,
        threadCount = 8, incrementalMode = "overwrite"))
    val pruned = spark.read.format("webdataset").load(outs).select("key")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("jpg,"), s"payload pruned from scan schema:\n$plan")
    assert(pruned.count() == server.allowedUrls.length)
  }
}
