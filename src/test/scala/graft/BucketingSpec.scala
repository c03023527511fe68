package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both sides on the join key
  * removes the per-query shuffle entirely — the "repeated large join"
  * strategy from the scale playbook, asserted on the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("join of two bucketed tables plans without a shuffle exchange") {
    // warehouse dir is a static conf — default ./spark-warehouse is fine
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = spark.read.parquet(sf("sf0.001/orders.parquet"))
      val li = spark.read.parquet(sf("sf0.001/lineitem.parquet"))
      o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val exchangesBeforeJoin = plan.linesIterator
        .takeWhile(!_.contains("SortMergeJoin"))
        .count(_.contains("Exchange hashpartitioning"))
      // the join inputs read bucketed files directly — no repartition
      assert(!plan.split("SortMergeJoin")(1).contains("Exchange hashpartitioning"),
        s"bucketed join must not reshuffle its inputs:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
