package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's one true stream (SURVEY §1.2): a `LoggerProcess`
  * polling the output dir for new `{shard}_stats.json` files every 5 s
  * and maintaining running aggregates (`logger.py:196-298`).
  *
  * Spark-native: a Structured Streaming file source over the stats
  * JSON schema (the source tracks processed files natively — F7's
  * de-dup set for free) + a running aggregate in `complete` output
  * mode (A6) with a processing-time trigger matching the reference's
  * 5 s poll (A7).
  */
object StatsStream {

  /** Schema of `{shard}_stats.json` (logger.py:162-191). */
  val statsSchema: StructType = StructType(Seq(
    StructField("count", LongType), StructField("successes", LongType),
    StructField("failed_to_download", LongType), StructField("failed_to_resize", LongType),
    StructField("duration", DoubleType),
    StructField("start_time", DoubleType), StructField("end_time", DoubleType),
    StructField("status_dict", MapType(StringType, LongType))))

  /** S12: streaming source over the stats sidecar directory. */
  def readStatsStream(spark: SparkSession, statsDir: String): DataFrame =
    spark.readStream
      .schema(statsSchema)
      .option("pathGlobFilter", "*_stats.json")
      .json(statsDir)

  /** A6: the running global aggregate (complete-mode, windowless). */
  def runningTotals(stats: DataFrame): DataFrame =
    stats.agg(
      sum("count").as("count"),
      sum("successes").as("successes"),
      sum("failed_to_download").as("failed_to_download"),
      sum("failed_to_resize").as("failed_to_resize"),
      min("start_time").as("start_time"),
      max("end_time").as("end_time"))
      .withColumn("img_per_sec",
        col("count") / greatest(col("end_time") - col("start_time"), lit(1e-9)))
      .withColumn("success_ratio",
        col("successes").cast("double") / greatest(col("count"), lit(1L)))

  /** A7: throttled emission — 5 s processing-time trigger like
    * `logger.py:199`; `complete` mode re-emits the running totals.
    */
  def start(spark: SparkSession, statsDir: String,
            queryName: String = "graft_stats",
            triggerMillis: Long = 5000): StreamingQuery = {
    val writer: DataStreamWriter[org.apache.spark.sql.Row] =
      runningTotals(readStatsStream(spark, statsDir))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.ProcessingTime(triggerMillis))
    writer.start()
  }
}
