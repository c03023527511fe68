package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.functions.PipelineFunctions

/** Property-style tests for key synthesis (T2) and sharding (R1) —
  * SURVEY §5's property list: bijectivity, lexicographic order =
  * (shard, idx) order, shard sizes/coverage/determinism. Uses
  * ScalaCheck generators with fixed seeds (deterministic CI).
  */
class KeyPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("key encoding is bijective and order-preserving (sampled)") {
    val pairGen = Gen.listOfN(60, for {
      s <- Gen.choose(0L, 99999L); i <- Gen.choose(0L, 999L)
    } yield (s, i))
    for (seed <- 1L to 5L) {
      val ps = sample(pairGen, seed).distinct
      val df = ps.toDF("s", "i")
      val keys = df.select(col("s"), col("i"),
          PipelineFunctions.computeKey(col("s"), col("i"), 3, 5).as("k"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
      // bijective on distinct inputs
      assert(keys.map(_._2).distinct.length == ps.length)
      // lexicographic key order == (shard, idx) order
      assert(keys.sortBy(_._2).map(_._1).toSeq == keys.map(_._1).sortBy(identity).toSeq)
      // fixed width
      assert(keys.forall(_._2.length == 8))
    }
  }

  test("sharding covers every row exactly once with bounded shard sizes") {
    val cases = for (seed <- 1L to 6L) yield
      (sample(Gen.choose(1, 200), seed), sample(Gen.choose(1, 20), seed + 100))
    for ((n, perShard) <- cases) {
      val df = (0 until n).map(i => s"u$i").toDF("url")
      val sharded = graft.sources.UrlReader.withShards(
        df, graft.config.DownloadConfig(samplesPerShard = perShard))
      val rows = sharded.groupBy("shard_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows.values.sum == n, "coverage: every row in exactly one shard")
      assert(rows.values.forall(_ <= perShard), s"no shard exceeds $perShard")
      assert(rows.count(_._2 < perShard) <= 1, "at most one partial shard (the last)")
      assert(rows.keySet == (0L until rows.size.toLong).toSet, "contiguous shard ids")
    }
  }

  test("embeddingDiversity: moment identity equals the serial all-pairs mean on random corpora") {
    val corpusGen = for {
      n <- Gen.choose(2, 30)
      dim <- Gen.choose(1, 6)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-400, 400).map(_ / 100.0f)))
    } yield (dim, vs.map(_.toArray))
    for (seed <- 1L to 6L) {
      val (dim, vs) = sample(corpusGen, seed)
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val got = graft.operators.Similarity.embeddingDiversity(df, "v", dim)
        .collect().head.getDouble(3)
      val q = vs.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
      val pairSum = (for (a <- q; b <- q if a ne b) yield
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum).sum
      val n = vs.length
      val expected = math.floor(
        pairSum.toDouble / (n.toDouble * (n.toDouble - 1.0)) / 1e12 * 1e6 + 0.5) / 1e6
      assert(got === expected, s"seed $seed n=$n dim=$dim")
    }
  }

  test("activityConcentration: gini within [0, 1-1/n] and invariant to event order/partitioning") {
    val countsGen = for {
      n <- Gen.choose(1, 40)
      cs <- Gen.listOfN(n, Gen.choose(1, 50))
    } yield cs
    for (seed <- 10L to 15L) {
      val cs = sample(countsGen, seed)
      val rows = cs.zipWithIndex.flatMap { case (c, u) =>
        (0 until c).map(i => (u.toLong, i.toLong)) }
      val df = rows.toDF("u", "ts")
      val r = graft.operators.EventAnalytics
        .activityConcentration(df.repartition(7), "u").collect().head
      val (n, gini) = (r.getLong(0), r.getDouble(2))
      assert(n === cs.length.toLong)
      assert(gini >= 0.0 && gini <= 1.0 - 1.0 / n + 1e-9, s"seed $seed gini=$gini n=$n")
      // partitioning/order immunity: a shuffled single-partition input
      // produces identical bits
      val r2 = graft.operators.EventAnalytics
        .activityConcentration(df.orderBy(col("ts").desc).coalesce(1), "u")
        .collect().head
      assert(r.toSeq === r2.toSeq, s"seed $seed: partitioning moved the result")
    }
  }

  test("seasonality: counts conserve and shares sum to 1 on random event sets") {
    val evGen = for {
      n <- Gen.choose(1, 120)
      ts <- Gen.listOfN(n, Gen.choose(0L, 40L * 86400000000L))
    } yield ts
    for (seed <- 21L to 24L) {
      val ts = sample(evGen, seed)
      val out = graft.operators.EventAnalytics
        .seasonality(ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("u", "ts"), "ts").collect()
      assert(out.length === 168)
      assert(out.map(_.getLong(2)).sum === ts.length.toLong, "conservation")
      val shareSum = out.map(_.getDouble(3)).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"shares ≈ 1: $shareSum")
    }
  }
}
