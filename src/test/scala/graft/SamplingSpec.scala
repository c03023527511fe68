package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 2000).map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("deterministic: same input, same membership, across independent runs") {
    val a = Sampling.deterministicSample(docs, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // rate lands near the target (hash-uniformity, not exactness)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate ${a.size / 2000.0}")
  }

  test("different salts draw independent samples over the same keys") {
    val a = Sampling.deterministicSample(docs, "id", 0.3, salt = "s1")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "id", 0.3, salt = "s2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != b, "distinct salts must not reproduce the same sample")
    // overlap near frac^2 expectation, not near-identical
    val overlap = (a & b).size.toDouble / 2000.0
    assert(overlap < 0.15, s"overlap $overlap suggests correlated samples")
  }

  test("stratified rates apply per stratum; membership is the documented formula") {
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.1)).select("id", "lang").collect()
    val en = out.count(_.getString(1) == "en") / 500.0
    val de = out.count(_.getString(1) == "de") / 1500.0
    assert(math.abs(en - 0.5) < 0.1, s"en rate $en")
    assert(math.abs(de - 0.1) < 0.05, s"de rate $de")
    // fraction 0 / 1 edges are exact, not approximate
    assert(Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 1.0)).count() == 500)
    assert(Sampling.stratifiedSample(docs, "lang", "id", Map.empty, defaultFrac = 0.0).count() == 0)
  }

  test("hashTopK returns exactly k rows and plans as a bounded top-k, not a sort") {
    val sampled = Sampling.hashTopK(docs, "id", 50)
    assert(sampled.count() == 50)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"bounded top-k plan expected:\n$plan")
    // k >= population degrades to the full set
    assert(Sampling.hashTopK(docs, "id", 5000).count() == 2000)
  }
}
