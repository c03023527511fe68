package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment (r15): measure alternative shapes for
  * Maintenance.profileTable's multi-countDistinct aggregate, which
  * burns ~68 CPU-s at sf0.1 in the 10-way Expand partial aggregate.
  * Compares, on the same session:
  *   A. the current shape (profileTable as-is)
  *   B. slim expand: per-column injective string encoding into
  *      (cid, val) pairs, two-level distinct, PLUS a separate
  *      min/max/null pass (2 scans, but 1/10th the agg width)
  * Usage: sbt "runMain graft.tools.ProfileShapeExp <dir>"
  */
object ProfileShapeExp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/orders.parquet")
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      val a = time(s"A-current-$pass") {
        graft.operators.Maintenance.profileTable(df).collect()
      }
      val b = time(s"B-slim-$pass") {
        import org.apache.spark.sql.types._
        val cols = df.columns.toSeq
        def enc(c: String) = df.schema(c).dataType match {
          case _: TimestampType => unix_micros(col(c)).cast("string")
          case _ => col(c).cast("string")
        }
        val src = graft.operators.Dedup.scanParallelismFloor(df)
        val slim = src.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
          struct(lit(i).as("cid"), enc(c).as("v"))
        }: _*)).as("e"))
          .select(col("e.cid").as("cid"), col("e.v").as("v"))
          .filter(col("v").isNotNull)
          .groupBy("cid", "v").agg(count(lit(1)).as("n"))
          .groupBy("cid").agg(count(lit(1)).as("ndv"))
        val ndv = slim.collect()
        def isNum(dt: DataType) = dt match {
          case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
               _: FloatType | _: DoubleType | _: DecimalType => true
          case _ => false
        }
        val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
          val base = Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"))
          if (isNum(df.schema(c).dataType))
            base ++ Seq(min(col(c)).cast("double").as(s"__min_$c"),
              max(col(c)).cast("double").as(s"__max_$c"))
          else base ++ Seq(min(col(c)).cast("string").as(s"__smin_$c"),
            max(col(c)).cast("string").as(s"__smax_$c"))
        }
        val stats = src.agg(aggs.head, aggs.tail: _*).collect()
        (ndv, stats)
      }
      val _ = (a, b)
    }
    spark.stop()
  }
}
