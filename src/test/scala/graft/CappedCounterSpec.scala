package graft

import org.apache.spark.sql.functions._

import graft.plans.CappedCounter.cappedCounter

/** The capped heavy-hitters aggregate (A2): exact below the cap,
  * top-half trimming above it, correct partial/final merge.
  */
class CappedCounterSpec extends SparkSpec {

  import spark.implicits._

  test("exact counts below the cap") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("k").repartition(3)
    val m = df.agg(cappedCounter(col("k"), 100).as("m"))
      .collect()(0).getAs[Map[String, Long]](0)
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("trims to top half by frequency above the cap") {
    // 60 distinct keys, key i appears i times; cap 20 → keeps ≤ 10
    // of the most frequent (the highest-i keys survive).
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"k$i"))
    val m = rows.toDF("k").repartition(4)
      .agg(cappedCounter(col("k"), 20).as("m"))
      .collect()(0).getAs[Map[String, Long]](0)
    assert(m.size <= 20, s"capped: ${m.size}")
    assert(m.contains("k60"), "most frequent key survives trimming")
    assert(!m.contains("k1"), "least frequent key trimmed")
  }

  test("grouped aggregation with deterministic map order") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")).toDF("g", "k")
    val rows = df.groupBy("g").agg(to_json(cappedCounter(col("k"), 10)).as("j"))
      .orderBy("g").collect()
    assert(rows(0).getString(1) == """{"x":2,"y":1}""")
    assert(rows(1).getString(1) == """{"z":1}""")
  }

  test("cap below 2 rejected at construction (trim would keep 0 keys)") {
    intercept[IllegalArgumentException] {
      graft.plans.CappedCounter(null, 1)
    }
  }
}
