package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within sketch error bounds of the exact count") {
    // 10k distinct ids, each seen 1-3 times; rse at p=12 is
    // 1.04/sqrt(4096) ~ 1.6%, so 10% is a >6-sigma safety margin
    val rows = (0 until 10000).flatMap(i => Seq.fill(1 + i % 3)(i.toLong))
    val df = rows.toDF("id")
    val out = Sketches.hllDistinct(df, "id", Seq.empty, p = 12).collect()
    assert(out.length == 1)
    val exact = out(0).getAs[Long]("n_exact")
    val est = out(0).getAs[Double]("hll_estimate")
    assert(exact == 10000L)
    assert(math.abs(est / exact - 1.0) < 0.10, s"estimate $est vs exact $exact")
  }

  test("HLL grouped variant: one row per group, estimates track group cardinality") {
    // cardinalities ≥ 2.5·m per group (the raw-HLL validity regime —
    // below it the skipped LinearCounting correction would be needed)
    val df = (0 until 45000).map(i => (if (i % 3 == 0) "a" else "b", i.toLong)).toDF("g", "id")
    val out = Sketches.hllDistinct(df, "id", Seq("g"), p = 12)
      .orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    for (r <- out) {
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est / exact - 1.0) < 0.10, s"group ${r.getString(0)}: $est vs $exact")
    }
  }

  test("HLL is deterministic: identical input, identical estimate") {
    val df = (0 until 5000).map(_.toLong).toDF("id")
    val a = Sketches.hllDistinct(df, "id", Seq.empty).collect()(0).getAs[Double]("hll_estimate")
    val b = Sketches.hllDistinct(df, "id", Seq.empty).collect()(0).getAs[Double]("hll_estimate")
    assert(a == b)
  }

  test("HLL register merge: partial sketches roll up to the direct global estimate") {
    // heavily OVERLAPPING groups: every id appears in 2-3 groups, so
    // summing per-group distincts would give ~2.5x the truth; merged
    // registers must instead equal sketching the union directly
    val df = (0 until 30000).flatMap { i =>
      val id = (i % 12000).toLong
      Seq(("g" + (i % 3), id), ("g" + ((i + 1) % 3), id))
    }.toDF("g", "id")
    val direct = Sketches.hllDistinct(df, "id", Seq.empty, p = 12)
      .collect()(0).getAs[Double]("hll_estimate")
    val regs = Sketches.hllRegisters(df, "id", Seq("g"), p = 12)
    assert(regs.select("g").distinct().count() == 3)
    val merged = Sketches.hllFromRegisters(regs, Seq.empty, p = 12)
      .collect()(0).getAs[Double]("hll_estimate")
    assert(merged == direct,
      s"register-max merge ($merged) must be bit-identical to direct sketching ($direct)")
    val summedPerGroup = Sketches.hllFromRegisters(regs, Seq("g"), p = 12)
      .agg(sum("hll_estimate")).collect()(0).getDouble(0)
    assert(summedPerGroup > 1.8 * merged,
      "overlap sanity: naive per-group summing would badly double-count")
  }

  test("bloom decontamination: no false negatives vs the exact shingle join") {
    val bench = Seq((900L, "the secret eval question about spark windows today ok"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the secret eval question about spark windows today ok extra words"), // contaminated
      (2L, "a completely different document with no overlap at all whatsoever"),
      (3L, "question about spark windows today ok trailing context here")        // shares 5-grams
    ).toDF("doc_id", "text")
    val out = Sketches.bloomDecontaminate(docs, bench, "text", "doc_id",
        shingleSize = 5, mBits = 1 << 12, kHashes = 3)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Boolean]("bloom_flagged"), r.getAs[Boolean]("exact_contaminated"))).toMap
    assert(byId(1L)._2 && byId(3L)._2 && !byId(2L)._2, "exact ground truth as planted")
    // the bloom's one-sided-error guarantee: exact => flagged
    for ((id, (bloom, exact)) <- byId if exact)
      assert(bloom, s"false negative on doc $id — bloom must flag every exact hit")
  }

  test("quantile sketch: exact interpolation on a power-of-two grid; bounded error") {
    import graft.operators.Sketches
    // 1..1000 over [0, 1024) with 8 bins: v/1024*8 is FP-exact for
    // integer v, so every expectation below is hand-derivable
    val vals = (1 to 1000).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val out = Sketches.quantileSketch(vals, "v", Seq("grp"),
        lo = 0.0, hi = 1024.0, numBuckets = 8,
        quantiles = Seq(0.0, 0.5, 1.0))
      .orderBy("quantile").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // bins hold 127,128,...,128,105 values; width 128
    // q=0   -> target 1   -> bin 0: (0 + 1/127)·128 = 1.007874…
    // q=0.5 -> target 500 -> bin 3 (cumBefore 383, cnt 128): 3·128 + 117 = 501
    // q=1   -> target 1000 -> bin 7 (cumBefore 895, cnt 105): 8·128 = 1024
    assert(out.toSeq == Seq((0.0, 1.007874, 1000L), (0.5, 501.0, 1000L), (1.0, 1024.0, 1000L)))
    // value error bounded by one bin width at every decile
    val qs = (1 to 9).map(_ / 10.0)
    val est = Sketches.quantileSketch(vals, "v", Seq("grp"),
        lo = 0.0, hi = 1024.0, numBuckets = 8, quantiles = qs)
      .orderBy("quantile").collect().map(_.getDouble(2))
    qs.zip(est).foreach { case (q, e) =>
      val exact = math.ceil(q * 1000).max(1).toInt // the target-ranked value
      assert(math.abs(e - exact) <= 128.0, s"q=$q est=$e exact=$exact")
    }
    // NULLs excluded; out-of-domain values clamp into edge bins
    val withNulls = Seq(("g", Some(-50.0)), ("g", None), ("g", Some(5000.0)))
      .toDF("grp", "v")
    val edge = Sketches.quantileSketch(withNulls, "v", Seq("grp"),
        lo = 0.0, hi = 1024.0, numBuckets = 8, quantiles = Seq(0.0, 1.0))
      .orderBy("quantile").collect()
    assert(edge.length == 2 && edge.forall(_.getLong(3) == 2L))
    assert(edge(0).getDouble(2) <= 128.0 && edge(1).getDouble(2) == 1024.0)
    // mergeability: per-half histograms summed == one-pass histogram
    val half1 = (1 to 500).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val half2 = (501 to 1000).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val merged = Sketches.quantileSketch(half1.union(half2), "v", Seq("grp"),
        lo = 0.0, hi = 1024.0, numBuckets = 8, quantiles = Seq(0.5))
      .collect().head.getDouble(2)
    assert(merged == 501.0, "union of shard streams gives the one-pass estimate")
  }

  test("CMS never underestimates and ranks the planted heavy hitter first") {
    // zipf-ish: "hot" 500 times, "warm" 60, 200 singletons
    val rows = Seq.fill(500)("hot") ++ Seq.fill(60)("warm") ++
      (0 until 200).map(i => s"cold$i")
    val df = rows.toDF("token")
    val out = Sketches.cmsTopK(df, "token", d = 4, w = 256, k = 5).collect()
    assert(out.nonEmpty)
    // CMS guarantee: collisions only ADD, estimate >= exact, always
    for (r <- out)
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"),
        s"underestimate for ${r.getString(0)}")
    assert(out(0).getString(0) == "hot" && out(0).getAs[Long]("exact_count") == 500L)
    assert(out(1).getString(0) == "warm")
  }

  test("KMV: exact below k, within error bounds above k, merge-consistent set ops") {
    // below k: estimate is EXACT (the synopsis holds every hash)
    val tiny = (0 until 40).map(i => s"v$i").toDF("v")
    val tinyRow = Sketches.kmvDistinct(tiny, "v", k = 64).collect()(0)
    assert(tinyRow.getDouble(0) == 40.0 && tinyRow.getInt(1) == 40)
    // above k: 5000 distinct, k=256 → rse ≈ 1/sqrt(k-1) ≈ 6.3%;
    // 25% is a ~4-sigma margin
    val big = (0 until 5000).map(i => s"item$i").toDF("v")
    val est = Sketches.kmvDistinct(big, "v", k = 256).collect()(0).getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est vs 5000")
    // duplicates do not move the synopsis (distinct hashes)
    val dup = (big.union(big)).toDF("v")
    val estDup = Sketches.kmvDistinct(dup, "v", k = 256).collect()(0).getDouble(0)
    assert(estDup == est, "KMV is a function of the distinct value set")
    // set ops: A = 0..2999, B = 2000..4999 → union 5000, intersect
    // 1000, jaccard 0.2
    val a = (0 until 3000).map(i => s"item$i").toDF("v")
    val b = (2000 until 5000).map(i => s"item$i").toDF("v")
    val ops = Sketches.kmvSetOps(a, b, "v", k = 256).collect()(0)
    val (u, ix, j) = (ops.getDouble(0), ops.getDouble(1), ops.getDouble(2))
    assert(math.abs(u - 5000.0) / 5000.0 < 0.25, s"union $u")
    assert(math.abs(j - 0.2) < 0.1, s"jaccard $j")
    assert(math.abs(ix - 1000.0) / 1000.0 < 0.6, s"intersect $ix")
    // disjoint sets: jaccard and intersection exactly 0
    val disjoint = Sketches.kmvSetOps(tiny,
      (0 until 40).map(i => s"w$i").toDF("v"), "v", k = 256).collect()(0)
    assert(disjoint.getDouble(1) == 0.0 && disjoint.getDouble(2) == 0.0)
  }

  test("bottomK aggregate: k smallest distinct values, merge-consistent across partitions") {
    val df = spark.range(0, 1000).repartition(8)
      .selectExpr("CAST(id % 100 AS BIGINT) AS v") // heavy duplication
    val out = df.agg(graft.plans.BottomKLongs.bottomK(col("v"), 10).as("bk"))
      .collect()(0).getSeq[Long](0)
    assert(out == (0L until 10L), s"10 smallest distinct: $out")
    // fewer distinct values than k: all of them, ascending
    val small = df.filter(col("v") < 3)
      .agg(graft.plans.BottomKLongs.bottomK(col("v"), 10).as("bk"))
      .collect()(0).getSeq[Long](0)
    assert(small == (0L until 3L), s"$small")
  }

  test("kmvOverlapMatrix: identical groups read jaccard 1, disjoint read 0, agrees with kmvSetOps") {
    val rows = (0 until 300).map(i => ("a", s"v$i")) ++        // a == b
      (0 until 300).map(i => ("b", s"v$i")) ++
      (0 until 300).map(i => ("c", s"w$i"))                    // c disjoint
    val df = rows.toDF("src", "v").repartition(7)
    val out = Sketches.kmvOverlapMatrix(df, "src", "v", k = 64)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(out.length == 3, "3 pairs from 3 groups")
    val ab = out.find(p => p._1 == "a" && p._2 == "b").get
    assert(ab._5 == 1.0, s"identical groups must read jaccard 1.0: $ab")
    assert(out.filter(p => p._2 == "c" || p._1 == "c")
      .forall(p => p._4 == 0.0 && p._5 == 0.0), s"disjoint pairs read 0: ${out.toSeq}")
    // the (a, c) pair must equal the dedicated two-corpus kmvSetOps
    val aDf = rows.filter(_._1 == "a").map(_._2).toDF("v")
    val cDf = rows.filter(_._1 == "c").map(_._2).toDF("v")
    val ref = Sketches.kmvSetOps(aDf, cDf, "v", k = 64).collect()(0)
    val ac = out.find(p => p._1 == "a" && p._2 == "c").get
    assert((ac._3, ac._4, ac._5) == (ref.getDouble(0), ref.getDouble(1), ref.getDouble(2)),
      s"matrix pair $ac must equal kmvSetOps ${ref.toSeq}")
  }

  test("percentileScore: exact fractions on a unit bin grid; groups independent; null stays null") {
    import spark.implicits._
    // unit-width bins (lo=0, hi=128, 128 buckets): value v in group A
    // (0..99, one per bin) has exactly v lower rows → percentile v/100.
    val a = (0 until 100).map(i => ("A", Some(i.toDouble), i))
    val b = (0 until 50).map(i => ("B", Some((2 * i).toDouble), 1000 + i))
    val rows = a ++ b :+ (("A", Option.empty[Double], 9999))
    val out = Sketches.percentileScore(rows.toDF("g", "v", "id"), "v", Seq("g"),
        lo = 0.0, hi = 128.0, numBuckets = 128)
      .collect().map(r => (r.getString(0), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    for ((g, id, p) <- out if g == "A" && id != 9999)
      assert(p === Some(math.floor(id / 100.0 * 1e6 + 0.5) / 1e6),
        s"A value $id percentile $p")
    // group B: value 2i has i lower rows of its OWN group's 50
    for ((g, id, p) <- out if g == "B")
      assert(p === Some(math.floor((id - 1000) / 50.0 * 1e6 + 0.5) / 1e6),
        s"B value ${id - 1000} percentile $p")
    assert(out.find(_._2 == 9999).get._3 === None, "null value → null percentile")
  }

  test("psiMatrix: hand-computed PSI on unit-width bins, identical distributions score 0") {
    import spark.implicits._
    // lo=0, hi=4, 4 buckets → value v lands in bin v.
    // A: {0:1, 1:1, 2:1}, B: {2:1, 3:1}, C identical to A.
    val rows = Seq(("A", 0.0), ("A", 1.0), ("A", 2.0),
                   ("B", 2.0), ("B", 3.0),
                   ("C", 0.0), ("C", 1.0), ("C", 2.0))
    val out = Sketches.psiMatrix(rows.toDF("g", "v"), "g", "v",
        lo = 0.0, hi = 4.0, numBuckets = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")),
      s"one row per unordered pair: ${out.keySet}")
    // replicate the quantized per-bin terms for (A, B): tA=3, tB=2,
    // smoothed pa=(cA+1)/7, pb=(cB+1)/6 over bins 0..3
    val cA = Map(0 -> 1L, 1 -> 1L, 2 -> 1L); val cB = Map(2 -> 1L, 3 -> 1L)
    val expQ = (0 until 4).map { bin =>
      val pa = (cA.getOrElse(bin, 0L) + 1).toDouble / 7.0
      val pb = (cB.getOrElse(bin, 0L) + 1).toDouble / 6.0
      math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 0.5).toLong
    }.sum
    val exp = math.floor(expQ / 1e6 * 1e6 + 0.5) / 1e6
    assert(out(("A", "B")) === exp, s"hand PSI $exp vs ${out(("A", "B"))}")
    assert(out(("A", "B")) > 0.0, "shifted distributions must score positive")
    assert(out(("A", "C")) === 0.0, "identical distributions → PSI exactly 0")
    assert(out(("B", "C")) === out(("A", "B")),
      "PSI is symmetric in the pair's distributions, not its labels")
  }

  test("psiMatrix: out-of-range values clamp to the edge bins, nulls are ignored") {
    import spark.implicits._
    val rows = Seq(("A", Some(-5.0)), ("A", Some(99.0)), ("B", Some(0.0)),
      ("B", Some(3.9)), ("B", Option.empty[Double]))
    val out = Sketches.psiMatrix(rows.toDF("g", "v"), "g", "v",
        lo = 0.0, hi = 4.0, numBuckets = 4)
      .collect()
    assert(out.length === 1)
    // A clamps to bins {0, 3}; B (nulls dropped) lands in {0, 3} too →
    // identical histograms, PSI 0 — proving both the clamp and the
    // null filter took effect
    assert(out(0).getDouble(2) === 0.0)
  }
}
