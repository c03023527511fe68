package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** As-of / range join semantics on hand-built cases. */
class JoinsSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
    (2L, 100L, "l3")).toDF("k", "ts", "lv")
  private val right = Seq(
    (1L, 90L, "r1"), (1L, 100L, "r2"), (1L, 150L, "r3"),
    (3L, 10L, "r4")).toDF("k", "ts", "rv")

  test("asOfJoin picks latest right row with ts <= left.ts; ties match; no match -> null") {
    val out = Joins.asOfJoin(left, right, Seq("k"), "ts", Seq("rv" -> "matched"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 50L, "l0", null),      // nothing at or before 50
      (1L, 100L, "l1", "r2"),     // tie at 100 matches (>= semantics)
      (1L, 200L, "l2", "r3"),     // latest before 200
      (2L, 100L, "l3", null)))    // key with no right rows
  }

  test("asOfJoin rejects output names that collide with left columns") {
    // a colliding name would make last(ignoreNulls) return the left
    // row's OWN value (it sits at currentRow) — must fail loudly
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(left, right, Seq("k"), "ts", Seq("rv" -> "lv"))
    }
  }

  test("topKByScore keeps duplicate (score,id) pairs like row_number would") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.7, 12L))
      .toDF("q", "score", "id")
    val top = df.groupBy("q")
      .agg(graft.plans.TopKByScore.topKByScore(col("score"), col("id"), 3).as("t"))
      .select(explode(col("t")).as("e")).select("e.score", "e.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(top == Seq((0.9, 10L), (0.9, 10L), (0.8, 11L)),
      s"duplicated pair occupies two of the k=3 slots: $top")
  }

  test("rangeJoin matches exactly the rows a naive cross filter would") {
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
        col("r.ts") >= col("l.ts") - 60 && col("r.ts") <= col("l.ts") + 60)
      .select(col("l.lv"), col("r.rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val bucketized = Joins.rangeJoin(left, right, Seq("k"), "ts",
        before = 60, after = 60, granularity = 25)
      .select(col("lv"), col("r_rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(bucketized == naive, s"bucketized $bucketized vs naive $naive")
    assert(naive.nonEmpty)
  }

  test("saltedJoin equals plain join, spreads hot keys across salts") {
    // hot key 1 dominates the left side
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 2L else 1L, i.toLong)).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = graft.operators.Skew.saltedJoin(big, dim, "k", "payload", 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the hot key's rows actually landed on multiple salts
    val salts = big.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("payload")), lit(8L))).distinct().count()
    assert(salts > 4, s"hot key spread over $salts salts")
  }
}
