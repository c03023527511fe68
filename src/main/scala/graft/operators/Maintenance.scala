package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table-maintenance operators — the operational side of running the
  * engine continuously at scale.
  *
  * Incremental ingestion (e.g. [[Dedup.incrementalExact]] appends, the
  * per-shard sinks, repeated small batch writes) accumulates small
  * files; every downstream scan then pays per-file open/footer costs
  * and the scheduler pays per-split overhead. Compaction is the
  * routine fix: rewrite a directory into size-targeted files,
  * optionally range-clustered on sort keys so parquet min/max
  * statistics enable data skipping for later predicate scans.
  */
object Maintenance {

  /** Compact a parquet directory into ~`targetBytes` files.
    *
    *  - Output file count = ceil(current bytes / targetBytes) —
    *    derived from a directory listing, not a data scan.
    *  - `sortCols` non-empty: rows are globally range-partitioned and
    *    sorted within partitions on those columns, so each output
    *    file covers a narrow key range — parquet row-group min/max
    *    stats then let later scans skip whole files/groups.
    *  - Rewrite is staged into a `_compact_tmp` sibling and swapped
    *    in only after the write succeeds — a failed compaction leaves
    *    the original directory untouched.
    *
    * Returns the number of output files.
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val path = new Path(dir)
    val fs = path.getFileSystem(new Configuration())
    val files = fs.listStatus(path).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return 0
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val shaped =
      if (sortCols.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)

    val tmp = new Path(path.getParent, path.getName + "_compact_tmp")
    shaped.write.mode("overwrite").parquet(tmp.toString)
    // swap: the staged write is durable before the original goes away
    fs.delete(path, true)
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed")
    nOut
  }
}
