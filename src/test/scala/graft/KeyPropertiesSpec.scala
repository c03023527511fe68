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
}
