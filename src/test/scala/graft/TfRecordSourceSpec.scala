package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.DownloadConfig
import graft.sinks.TfRecordCodec
import graft.sources.tfrecord.TfExampleCodec

/** DataSourceV2 round-trip for the TFRecord reader: files written by
  * the tfrecord sink read back via `spark.read.format("tfrecord")`,
  * with CRC verification, schema inference, and column pruning.
  */
class TfRecordSourceSpec extends SparkSpec {

  private lazy val server = new graft.util.HttpImageServer
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def pipelineOut(tag: String, nUrls: Int): String = {
    val d = Files.createTempDirectory(s"graft_tfsrc_$tag").toString
    val rows = server.allowedUrls.take(nUrls).zipWithIndex
      .map { case (u, i) => s"cap $i,$u" }
    Files.write(java.nio.file.Paths.get(d, "in.csv"),
      ("caption,url\n" + rows.mkString("\n")).getBytes)
    val out = Files.createTempDirectory(s"graft_tfsrc_${tag}_out").toString
    Pipeline.download(spark, s"$d/in.csv", out,
      DownloadConfig(outputFormat = "tfrecord", captionCol = Some("caption"),
        samplesPerShard = 5, threadCount = 8, incrementalMode = "overwrite"))
    out
  }

  test("round-trip: pipeline tfrecords -> tfrecord source rows") {
    val out = pipelineOut("rt", server.allowedUrls.length)
    val back = spark.read.format("tfrecord").load(out)
    // inference: key/txt/url/status as string, payload binary, dims int64
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("key") == StringType && byName("txt") == StringType)
    assert(byName("jpg") == BinaryType)
    assert(byName("width") == LongType && byName("height") == LongType)
    val rows = back.orderBy("key").collect()
    assert(rows.length == server.allowedUrls.length)
    assert(rows.forall(r => r.getAs[Array[Byte]]("jpg").length > 100))
    assert(rows.forall(r => r.getAs[String]("txt").startsWith("cap ")))
    assert(rows.forall(r => r.getAs[Long]("width") > 0))
    // join back against the parquet sidecar on key
    val sidecar = spark.read.parquet(s"$out/*.parquet")
    assert(back.join(sidecar, "key").count() == rows.length)
  }

  test("glob and single-file paths load (not only directories)") {
    val out = pipelineOut("glob", 3)
    assert(spark.read.format("tfrecord").load(s"$out/*.tfrecord").count() == 3)
    assert(spark.read.format("tfrecord").load(s"$out/00000.tfrecord").count() == 3)
  }

  test("column pruning: payload feature skipped when unselected") {
    val out = pipelineOut("prune", 3)
    val pruned = spark.read.format("tfrecord").load(out).select("key")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("jpg"), s"payload pruned from scan schema:\n$plan")
    assert(pruned.count() == 3)
  }

  test("user schema overrides inference (binary caption, int width)") {
    val out = pipelineOut("schema", 3)
    val back = spark.read.format("tfrecord")
      .schema(StructType(Seq(
        StructField("key", StringType), StructField("txt", BinaryType),
        StructField("width", IntegerType))))
      .load(out)
    val r = back.orderBy("key").collect()
    assert(r.length == 3)
    assert(new String(r.head.getAs[Array[Byte]]("txt"), "UTF-8").startsWith("cap "))
    assert(r.forall(_.getAs[Int]("width") > 0))
  }

  test("decoder parses every typed feature the writer emits") {
    // one Example with all four feature shapes, through the REAL
    // writer bytes, then the decoder
    val ex = TfRecordCodec.example(Seq(
      "b" -> TfRecordCodec.bytesFeature("hello".getBytes("UTF-8")),
      "bl" -> TfRecordCodec.bytesListFeature(Seq("x".getBytes, "yz".getBytes)),
      "f" -> TfRecordCodec.floatFeature(Seq(1.5f, -2.25f)),
      "i" -> TfRecordCodec.int64Feature(Seq(7L, -1L, Long.MaxValue))))
    val feats = TfExampleCodec.parseExample(ex, _ => true)
    assert(new String(feats("b").asInstanceOf[TfExampleCodec.BytesF].vs.head, "UTF-8") == "hello")
    assert(feats("bl").asInstanceOf[TfExampleCodec.BytesF].vs.map(new String(_, "UTF-8")) == Vector("x", "yz"))
    assert(feats("f").asInstanceOf[TfExampleCodec.FloatF].vs == Vector(1.5f, -2.25f))
    assert(feats("i").asInstanceOf[TfExampleCodec.LongF].vs == Vector(7L, -1L, Long.MaxValue))
    // want-filter skips unparsed features
    assert(TfExampleCodec.parseExample(ex, Set("f")).keySet == Set("f"))
  }

  test("framing: record round-trip and corruption detection") {
    val payload = "framed tfrecord data".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    TfRecordCodec.writeRecord(bos, payload)
    TfRecordCodec.writeRecord(bos, payload.reverse)
    val good = bos.toByteArray
    val in = new java.io.ByteArrayInputStream(good)
    assert(TfExampleCodec.readRecord(in).toSeq == payload.toSeq)
    assert(TfExampleCodec.readRecord(in).toSeq == payload.reverse.toSeq)
    assert(TfExampleCodec.readRecord(in) == null) // clean EOF
    // flip one payload byte: the data CRC must catch it
    val bad = good.clone()
    bad(14) = (bad(14) ^ 0x01).toByte
    val err = intercept[java.io.IOException] {
      TfExampleCodec.readRecord(new java.io.ByteArrayInputStream(bad))
    }
    assert(err.getMessage.contains("CRC"))
  }

  test("scalar/array mismatch raises a clear error instead of bad data") {
    val dir = Files.createTempDirectory("graft_tfsrc_ragged").toString
    val ex1 = TfRecordCodec.example(Seq(
      "key" -> TfRecordCodec.bytesFeature("a".getBytes),
      "v" -> TfRecordCodec.int64Feature(Seq(1L)))) // infers scalar
    val ex2 = TfRecordCodec.example(Seq(
      "key" -> TfRecordCodec.bytesFeature("b".getBytes),
      "v" -> TfRecordCodec.int64Feature(Seq(1L, 2L)))) // ragged
    val f = new java.io.FileOutputStream(s"$dir/00000.tfrecord")
    TfRecordCodec.writeRecord(f, ex1); TfRecordCodec.writeRecord(f, ex2); f.close()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("tfrecord").load(dir).collect()
    }
    assert(e.getCause.getMessage.contains("has 2 int64 values"))
    // explicit array schema reads the same file fine
    val ok = spark.read.format("tfrecord")
      .schema(StructType(Seq(StructField("key", StringType),
        StructField("v", ArrayType(LongType))))).load(dir)
      .orderBy("key").collect()
    assert(ok.map(_.getSeq[Long](1)).toSeq == Seq(Seq(1L), Seq(1L, 2L)))
  }
}
