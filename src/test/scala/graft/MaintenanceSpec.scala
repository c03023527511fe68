package graft

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Small-file compaction: file-count reduction, row preservation,
  * sort clustering, and crash-safety staging.
  */
class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("compaction merges small files, preserves rows, clusters on sort keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 20 tiny appends — the incremental-ingest small-files pattern
    for (b <- 0 until 20)
      (0 until 50).map(i => (b * 50L + i, s"doc $b $i"))
        .toDF("id", "text").coalesce(1).write.mode("append").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).length
    assert(parquetFiles >= 20, "pre-state: many small files")

    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = Long.MaxValue,
      sortCols = Seq("id"))
    assert(nOut == 1, "all files fit one target-sized output")
    assert(parquetFiles == 1, "compacted to a single file")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000, "every row preserved")
    assert(back.agg(min("id"), max("id")).collect()(0).toSeq == Seq(0L, 999L))
    // clustering: within the file rows are sorted on the key
    val ids = back.limit(10).collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows clustered by sort key")
  }

  test("compaction to a byte target yields multiple range-clustered files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (0 until 2000).map(i => (i.toLong, "x" * 100)).toDF("id", "payload")
      .coalesce(1).write.parquet(dir)
    val total = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = total / 3 + 1,
      sortCols = Seq("id"))
    assert(nOut == 3, s"ceil(total / (total/3+1)) target files, got $nOut")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    // range clustering: per-file id ranges must not overlap
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 3)
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 < b._1 },
      s"non-overlapping file ranges: ${ranges.toSeq}")
  }
}
