package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

import scala.util.Random

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Five families, all pure DataFrame transforms (shuffle-conscious,
  * no driver-side loops, no UDFs in the hot path):
  *
  *  - [[exact]]           — md5-fingerprint group-by (one shuffle).
  *  - [[minhashNearDups]] — MinHash + LSH banding: shingle → signature
  *                          (codegen'd expressions) → band-bucket join
  *                          → exact-Jaccard verification of candidates.
  *  - [[simhashNearDups]] — 64-bit SimHash + chunk banding + Hamming
  *                          distance verification (`bit_count(xor)`).
  *  - [[ngramJaccardPairs]] — exact pairwise n-gram Jaccard via a
  *                          shingle-explode equi-join (the exact
  *                          counterpart LSH approximates).
  *  - [[embeddingNearDups]] — cosine near-dup over embeddings via
  *                          random-hyperplane LSH buckets + exact
  *                          cosine verification.
  *
  * Scale design: every candidate-generation step is an equi-join on a
  * bucket key (hash-partitionable at any cluster size); oversized
  * buckets (degenerate shingles / all-zero vectors) are capped via
  * `maxBucketSize` so one hot key cannot produce a quadratic task —
  * dropped buckets only cost recall on pairs other bands still catch.
  */
object Dedup {

  /** MinHash modulus: 2^31-1 (Mersenne prime). Coefficients and
    * reduced shingle hashes are < 2^31, so a*h+b < 2^62 — no long
    * overflow under ANSI mode, on any engine.
    */
  private val Prime = 2147483647L

  /** SCAN-PARALLELISM FLOOR for the signature-heavy operators: when
    * the input's scan yields fewer partitions than the session's
    * parallelism, round-robin repartition it so the scan-side
    * expression work (shingling + the 128-hash md5 MinHash signature,
    * the dominant CPU of every LSH chain) spreads across all cores.
    * Measured r14: the single-row-group testdata parquet cannot be
    * byte-range split, so dedup_minhash_lsh ran 7.2 s of single-task
    * signature stages on one core while 31 idled — with the floor the
    * bench-shape query dropped 3.40 → 2.53 s (containment 3.28 →
    * 1.90, ngram_jaccard 3.49 → 2.27). Scale behavior: at production
    * scale scan partition counts exceed core counts, so the floor
    * never engages and no shuffle is added — adaptive to the input,
    * not a local-mode constant. Applied ONLY in the heavy-expression
    * operators: a global reader-level floor measured a ~0.2–0.7 s
    * shuffle+planning tax on every cheap single-pass query, which a
    * 32-way corpus of sub-millisecond scans never earns back.
    * Determinism: round-robin repartition local-sorts its input
    * (SPARK-23207), and every downstream aggregate here is
    * partition-order immune (integer/exact arithmetic).
    */
  private[graft] def scanParallelismFloor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // r14-ADVICE fix: probing `df.rdd` on a shuffle-bearing plan under
    // AQE finalizes the adaptive plan and eagerly EXECUTES the upstream
    // shuffle stages, which the real query then re-runs (no
    // cross-execution stage reuse) — silently doubling the upstream
    // work for a non-scan input. Gate the probe on NARROW-over-scan
    // plans (projections/filters/generates/unions over leaf relations),
    // where `.rdd` builds the scan RDD without launching any job and
    // the probed count really is the scan's. A shuffle-bearing input is
    // already redistributed by its own exchange, so the floor had
    // nothing to add there anyway.
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.optimizedPlan.collectFirst {
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[Filter] ||
        p.isInstanceOf[Generate] || p.isInstanceOf[Union] ||
        p.isInstanceOf[LeafNode]) => p
    }.isDefined
    if (!wide && df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact dedup: group by normalized-text fingerprint; keep the
    * minimum id as canonical. One hash-aggregate shuffle; the map-side
    * partial aggregation makes this safe on 100 TB of documents.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count("*").as("n_docs"))

  /** Default coefficients for the SQL-registered `minhash_signature`
    * — same [[DefaultSeed]] family as the operator surface, so the
    * SQL function and the DataFrame operators agree under the
    * oracle-robustness salt too.
    */
  def defaultCoeffs(numHashes: Int): Seq[(Long, Long)] = minhashCoeffs(numHashes, DefaultSeed)

  /** Seeded MinHash coefficient pairs (a, b), identical on every
    * executor because they are baked into the plan as literals.
    * Public so the oracle SQL generator can bake the SAME pairs into
    * the DuckDB replication of the signature.
    */
  def minhashCoeffs(numHashes: Int, seed: Long = graft.operators.Dedup.DefaultSeed): Seq[(Long, Long)] = {
    val rng = new Random(seed)
    Seq.fill(numHashes)((math.abs(rng.nextLong()) % Prime + 1, math.abs(rng.nextLong()) % Prime))
  }

  /** Default seed for the portable LSH chains (MinHash coefficients,
    * hyperplanes): 42 unless [[graft.config.PortableSalt]] is set —
    * the oracle-robustness knob that re-derives the whole constant
    * family on both engines.
    */
  val DefaultSeed: Long = graft.config.PortableSalt.seed

  /** Cross-engine 60-bit string hash: the first 15 hex chars of md5,
    * parsed as an integer. Any engine with md5 reproduces it exactly
    * (the DuckDB oracle does), unlike Spark's seed-42 xxh64 kernel.
    * Production defaults keep the faster native xxh64; the
    * oracle-checked LSH queries pass `portableHash = true` so the
    * whole approximate pipeline is independently recomputable.
    * Under [[graft.config.PortableSalt]] the salt prefixes the md5
    * input (on both engines); unsalted, the expression is exactly the
    * committed baseline's.
    */
  def portableHash60(s: Column): Column =
    if (graft.config.PortableSalt.isDefault)
      conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")
    else
      conv(substring(md5(concat(lit(graft.config.PortableSalt.hashPrefix),
        s.cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")

  /** MinHash signature of the shingle set as `array<bigint>`:
    * min over shingles of `(a·(xxh64(s) mod P) + b) mod P` per hash
    * function — a native one-pass expression
    * ([[graft.plans.MinHashSignatureExpr]]); all K mins computed in a
    * single compiled loop over the shingle array.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = graft.operators.Dedup.DefaultSeed,
                       portableMd5: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.plans.MinHashSignatureExpr(
      expression(shingles), minhashCoeffs(numHashes, seed), Prime, portableMd5))
  }

  /** LSH band keys: hash each r-row slice of the signature. Two docs
    * land in the same (band, key) bucket iff their signatures agree on
    * that band — P[collision] = 1-(1-j^r)^b for Jaccard j.
    *
    * `portable = false` (default): 8-byte `xxhash64` keys — smallest
    * shuffle, Spark-only. `portable = true`: the joined slice values
    * as a string key (equality-equivalent, engine-independent).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int,
               portable: Boolean = false): Column =
    array((0 until bands).map { j =>
      val sliced = slice(sig, j * rowsPerBand + 1, rowsPerBand)
      val key =
        if (portable) concat_ws("_", sliced.cast("array<string>"))
        else xxhash64(sliced)
      struct(lit(j).as("band"), key.as("key"))
    }: _*)

  /** Shared MinHash-LSH candidate generation over a (id, shingles)
    * frame: signature → band keys → capped bucket equi-join →
    * deduped (id_a, id_b) pairs with id_a < id_b. Buckets carry ONLY
    * (id, band, key): the band explode multiplies rows by `bands`, so
    * shuffling shingle arrays through it would multiply shuffle bytes
    * 32×; shingles rejoin later, once per candidate id. Degenerate
    * buckets are capped: a bucket of size m yields m² candidate pairs,
    * so beyond `maxBucketSize` it is a skew bomb, and near-dup pairs
    * in a mega-bucket are overwhelmingly re-found by other bands.
    */
  private def lshCandidatePairs(
      base: DataFrame, numHashes: Int, bands: Int, seed: Long,
      maxBucketSize: Int, portableHash: Boolean): DataFrame = {
    val r = numHashes / bands
    // portableHash: hash shingles with the engine-independent 60-bit
    // md5 hash (natively, inside the signature expression's loop) so a
    // DuckDB oracle can replicate the signature.
    val sigs = base.withColumn("sig",
      minhashSignature(col("shingles"), numHashes, seed, portableMd5 = portableHash))
    val buckets = sigs
      .select(col("id"), explode(bandKeys(col("sig"), bands, r, portableHash)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val counts = buckets.groupBy("band", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val sized = buckets.join(counts, Seq("band", "key"))
    val a = sized.select(col("band"), col("key"), col("id").as("id_a"))
    val b = sized.select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
  }

  /** MinHash band-bucket occupancy profile — the text-side twin of
    * [[Similarity.lshBucketProfile]]: per band, the bucket count,
    * max/avg occupancy, buckets over the cap, and the EXACT
    * candidate-pair work Σ m·(m−1)/2 under the cap that
    * [[minhashNearDups]]' candidate join will pay. Run it before a
    * corpus-scale dedup to see which bands carry hot buckets
    * (degenerate shingles, boilerplate) and how much the cap is
    * actually dropping. Unlike the hyperplane key space (fixed
    * 2^nPlanes — density-quadratic, see the knnGraph guidance), band
    * keys hash full signature slices, so occupancy here tracks true
    * near-dup structure plus degenerate content, not corpus density —
    * the profile tells you which.
    *
    * Determinism/portability: identical signature/band chain as the
    * build (same seed, same portable-hash toggle); counts/max/pairs
    * exact longs; avg one quantized IEEE division.
    *
    * Scale shape: one corpus scan into slim (id, band, key) rows, one
    * map-side-combined (band, key) count, one tiny per-band rollup;
    * shingles never leave the scan, text never shuffles.
    */
  def minhashBandProfile(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      seed: Long = graft.operators.Dedup.DefaultSeed,
      maxBucketSize: Int = 1000,
      portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val rd = graft.functions.MathFunctions.roundTo _
    val r = numHashes / bands
    val base = df.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    val sigs = base.withColumn("sig",
      minhashSignature(col("shingles"), numHashes, seed, portableMd5 = portableHash))
    val counts = sigs
      .select(col("id"), explode(bandKeys(col("sig"), bands, r, portableHash)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
      .groupBy("band", "key").agg(count("*").as("m"))
    counts.groupBy("band")
      .agg(count("*").as("n_buckets"),
        sum("m").as("n_docs"),
        max("m").as("max_occupancy"),
        rd(sum("m").cast("double") / count("*").cast("double"), 6).as("avg_occupancy"),
        sum(when(col("m") > maxBucketSize.toLong, 1L).otherwise(0L)).as("n_over_cap"),
        sum(when(col("m") <= maxBucketSize.toLong,
          expr("m * (m - 1) div 2")).otherwise(0L)).as("candidate_pairs"))
      .orderBy("band")
  }

  /** Threshold-consistent LSH band count: among the divisors `b` of
    * `numHashes`, the one whose banding S-curve midpoint (1/b)^(1/r)
    * with r = numHashes/b sits closest to the verify `threshold` —
    * the classic sizing rule (the midpoint is where the collision
    * probability 1−(1−j^r)^b rises fastest, so candidates concentrate
    * around pairs the verify will actually keep). For numHashes = 128:
    * threshold 0.9 → 8 bands, 0.7 → 16, 0.4 → 32, 0.15 → 64.
    *
    * Advisory, not a default: unlike hyperplane key depth (a measured
    * SCALE trap, [[AutoPlanes]]), band count is a RECALL/precision
    * dial — candidate work stays cap-bounded at any banding — so the
    * committed operator defaults stay pinned and this feeds
    * [[minhashRecallProfile]]'s `bandsList` (probe around the rule's
    * pick, read the measured work/recall row, then build).
    * Deterministic: StrictMath on exact divisor arithmetic; ties take
    * the fewest bands.
    */
  def derivedBands(numHashes: Int, threshold: Double): Int = {
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1), got $threshold")
    (1 to numHashes).filter(numHashes % _ == 0).minBy { b =>
      val r = numHashes / b
      StrictMath.abs(StrictMath.pow(1.0 / b, 1.0 / r) - threshold)
    }
  }

  /** The recall half of the band-count decision —
    * [[minhashBandProfile]] reports what a banding COSTS; this reports
    * what it actually CATCHES, the text-side twin of
    * [[Similarity.lshRecallProfile]]. One row per candidate `bands`
    * value (numHashes fixed): (n_bands, candidate_pairs, hits,
    * truth_n, recall) where candidate_pairs is the exact capped
    * candidate-join work Σ m·(m−1)/2 across bands and recall is
    * measured on a deterministic `sampleQ`-document sample: of the
    * TRUE near-dup pairs (exact shingle Jaccard ≥ `threshold`)
    * touching a sampled doc, the fraction whose pair shares at least
    * one capped band bucket. This turns the theoretical
    * 1−(1−j^r)^b recall curve into an empirical measurement on the
    * actual corpus — boilerplate, skew, caps and all — BEFORE the
    * corpus-scale dedup pays for the banding it picks.
    *
    * Determinism/portability: the sample is the `sampleQ` ids with the
    * largest portable seed-hash (the k-means-seed chain); truth is the
    * same exact-Jaccard arithmetic as [[minhashNearDups]]' verify
    * (integer set sizes, one IEEE division); signatures/band keys are
    * the identical chain as the build, so with `portableHash = true`
    * the whole profile is engine-replayable.
    *
    * Scale shape: truth is ONE corpus scan against the broadcast
    * Q-row shingle sample; each bands value is one more scan into slim
    * (id, band, key) rows (shingles never shuffle), a map-side
    * -combined bucket count, and a broadcast join against the sample's
    * ≤ Q·bands bucket keys. Candidate rows are capped by
    * Q · bands · maxBucketSize.
    */
  def minhashRecallProfile(
      df: DataFrame, textCol: String, idCol: String,
      bandsList: Seq[Int], shingleSize: Int = 5, numHashes: Int = 128,
      threshold: Double = 0.7, seed: Long = graft.operators.Dedup.DefaultSeed,
      maxBucketSize: Int = 1000, sampleQ: Int = 8,
      portableHash: Boolean = false): DataFrame = {
    require(bandsList.nonEmpty && bandsList.forall(b => b >= 1 && numHashes % b == 0),
      s"every bands value must divide numHashes=$numHashes, got $bandsList")
    require(sampleQ >= 1, s"sampleQ must be positive, got $sampleQ")
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val rd = graft.functions.MathFunctions.roundTo _
    val base = scanParallelismFloor(df).select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    // deterministic portable sample (same chain as the k-means seeds)
    val seedHash = pmod(pmod(col("id"), lit(1000003L)) *
      lit(graft.config.PortableSalt.seedMul), lit(2147483647L))
    val sample = base
      .join(broadcast(base
        .agg(graft.plans.TopKByScore.topKByScore(
          seedHash.cast("double"), col("id"), sampleQ).as("top"))
        .select(explode(col("top.id")).as("query_id"))),
        col("id") === col("query_id"))
      .select(col("query_id"), col("shingles").as("q_sh"))
      .localCheckpoint(eager = true) // Q rows, reused by truth + every bands value
    // exact ground truth: near-dup pairs by shingle Jaccard >= threshold
    // (the same verify arithmetic as minhashNearDups), self excluded
    val truth = base.crossJoin(broadcast(sample))
      .filter(col("id") =!= col("query_id"))
      .filter(size(array_intersect(col("shingles"), col("q_sh"))).cast("double") /
        size(array_union(col("shingles"), col("q_sh"))).cast("double") >= threshold)
      .select(col("query_id"), col("id").as("corpus_id"))
      .localCheckpoint(eager = true) // bounded by Q · near-dup degree
    val truthN = truth.agg(count(lit(1)).as("truth_n"))
    // Branch overlap (the lshRecallProfile r15 change): measured and
    // REVERTED here — this operator's lazy 3-branch union is already
    // compute-efficient (AQE materializes the independent branch
    // stages concurrently inside one job, and exchange reuse shares
    // the floored scan), while eager per-branch materialization made
    // it 1.46 → 2.34 s and adding a shared signature checkpoint
    // 3.08 s. The embedding twin won from the same pattern because it
    // was GAP-bound (2.3 CPU-s across 22 sequential stages), not
    // compute-bound.
    bandsList.map { b =>
      val r = numHashes / b
      val buckets = base
        .withColumn("sig",
          minhashSignature(col("shingles"), numHashes, seed, portableMd5 = portableHash))
        .select(col("id"), explode(bandKeys(col("sig"), b, r, portableHash)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val counts = buckets.groupBy("band", "key").agg(count(lit(1)).as("m"))
      val work = counts.agg(coalesce(sum(when(col("m") <= maxBucketSize.toLong,
          expr("m * (m - 1) div 2")).otherwise(0L)), lit(0L)).as("candidate_pairs"))
      val qb = sample
        .withColumn("sig",
          minhashSignature(col("q_sh"), numHashes, seed, portableMd5 = portableHash))
        .select(col("query_id"), explode(bandKeys(col("sig"), b, r, portableHash)).as("bk"))
        .select(col("query_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = buckets
        .join(counts.filter(col("m") <= maxBucketSize.toLong).select("band", "key"),
          Seq("band", "key"))
        .join(broadcast(qb), Seq("band", "key"))
        .filter(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id").as("corpus_id")).distinct()
      val hits = cand.join(broadcast(truth), Seq("query_id", "corpus_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      work.crossJoin(hits).crossJoin(truthN)
        .select(lit(b).as("n_bands"), col("candidate_pairs"), col("hits"),
          col("truth_n"),
          when(col("truth_n") === 0L, lit(1.0))
            .otherwise(rd(col("hits").cast("double") / col("truth_n").cast("double"), 6))
            .as("recall"))
    }.reduce(_ union _).orderBy("n_bands")
  }

  /** Candidate pairs from LSH banding, verified with exact Jaccard over
    * the shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b
    * and jaccard >= threshold.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7, seed: Long = graft.operators.Dedup.DefaultSeed,
      maxBucketSize: Int = 1000,
      portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands " +
        "(a remainder silently drops hashes from the band keys, degrading LSH recall)")
    val base = scanParallelismFloor(df).select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    val cand = lshCandidatePairs(base, numHashes, bands, seed, maxBucketSize, portableHash)
    // Exact-Jaccard verification: join the slim shingle frame twice.
    val shA = base.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = base.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    cand.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), (col("inter") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Containment near-dups (Gopher/MassiveText-style): candidates from
    * the SAME MinHash-LSH banding as [[minhashNearDups]], but verified
    * with MAX-CONTAINMENT `|A∩B| / min(|A|, |B|)` over the shingle
    * sets — the right metric when "duplicate" means one document
    * EMBEDS the other (quoted articles, boilerplate-wrapped copies,
    * template fills), which symmetric Jaccard under-scores as the
    * size gap grows (a doc fully contained in one 3× its size caps at
    * jaccard 1/3 but containment 1.0).
    *
    * Honest recall note: candidate generation is Jaccard-driven
    * (MinHash bands collide with probability set by the SYMMETRIC
    * overlap), so severe size asymmetry lowers band-collision odds —
    * the standard practice this mirrors (containment verify over
    * MinHash candidates) trades that tail for the same capped-bucket
    * scale shape as every other LSH operator here; true asymmetric
    * hashing would need a different candidate scheme.
    * Returns (id_a, id_b, containment) with id_a < id_b.
    */
  def containmentNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, seed: Long = graft.operators.Dedup.DefaultSeed,
      maxBucketSize: Int = 1000,
      portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val base = scanParallelismFloor(df).select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    val cand = lshCandidatePairs(base, numHashes, bands, seed, maxBucketSize, portableHash)
    val shA = base.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = base.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    cand.join(shA, "id_a").join(shB, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        (col("inter") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Edit-distance-verified near-dup pairs: MinHash-LSH banding
    * proposes candidates (identical generation to
    * [[minhashNearDups]] — same signatures, bands, bucket cap), but
    * verification is `levenshtein(a, b) <= maxDist` over the RAW
    * text instead of shingle Jaccard — the right verifier when
    * "duplicate" means a few character edits (OCR noise, template
    * fills, typo farms) rather than shared vocabulary. Returns
    * (id_a, id_b, dist) with id_a < id_b, dist <= maxDist.
    *
    * Cost control for the quadratic kernel: Spark's bounded
    * `levenshtein(l, r, threshold)` runs the banded O(maxDist·n)
    * algorithm and bails to -1 past the bound, and a length
    * pre-filter |len_a − len_b| ≤ maxDist (edit distance is ≥ the
    * length gap) discards most candidates while pairs are still
    * (id, id, int) rows — text is joined back only for surviving
    * pairs, once per side, and never rides the banding explode.
    *
    * Engine note: Spark counts edits in CODEPOINTS; DuckDB's
    * levenshtein counts UTF-8 bytes. Identical on ASCII (the oracle
    * corpus); multi-byte text can differ — documented rather than
    * papered over, since codepoints are the semantics a user wants.
    */
  def editDistanceNearDups(
      df: DataFrame, textCol: String, idCol: String,
      maxDist: Int, shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32, seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000,
      portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val r = numHashes / bands
    val base = scanParallelismFloor(df).select(col(idCol).as("id"), col(textCol).as("txt"),
      length(col(textCol)).as("len"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    val sigs = base.withColumn("sig",
      minhashSignature(col("shingles"), numHashes, seed, portableMd5 = portableHash))
    // Bucket rows carry (id, len, band, key): len is one long and
    // lets the length pre-filter run BEFORE any text moves.
    val buckets = sigs
      .select(col("id"), col("len"),
        explode(bandKeys(col("sig"), bands, r, portableHash)).as("bk"))
      .select(col("id"), col("len"), col("bk.band"), col("bk.key"))
    val counts = buckets.groupBy("band", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val sized = buckets.join(counts, Seq("band", "key"))
    val a = sized.select(col("band"), col("key"), col("id").as("id_a"), col("len").as("len_a"))
    val b = sized.select(col("band"), col("key"), col("id").as("id_b"), col("len").as("len_b"))
    val cand = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lit(maxDist.toLong))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val txtA = base.select(col("id").as("id_a"), col("txt").as("txt_a"))
    val txtB = base.select(col("id").as("id_b"), col("txt").as("txt_b"))
    cand.join(txtA, "id_a").join(txtB, "id_b")
      .withColumn("dist", levenshtein(col("txt_a"), col("txt_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** 64-bit SimHash of the token multiset: per bit of each token's
    * xxh64, fold a +1/-1 counter; sign bits packed into one long —
    * a native one-pass expression ([[graft.plans.SimHash64Expr]]).
    */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.plans.SimHash64Expr(expression(tokens(text))))
  }

  /** SimHash over the low `nBits` bits of the portable 60-bit md5
    * token hash — the oracle-parity form, hashed natively in the
    * expression loop.
    */
  def simhashPortable(text: Column, nBits: Int = 60): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.plans.SimHash64Expr(expression(tokens(text)), nBits, portableMd5 = true))
  }

  /** SimHash near-dups: band the fingerprint into `chunks` equal bit
    * slices (pigeonhole: Hamming ≤ chunks-1 ⇒ at least one chunk
    * equal), bucket-join on chunks, verify with `bit_count(xor)`.
    *
    * `portableHash = true` switches to the 60-bit md5-based simhash
    * (4 × 15-bit chunks) that the DuckDB oracle recomputes.
    */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      portableHash: Boolean = false): DataFrame = {
    val chunks = 4
    val chunkBits = if (portableHash) 15 else 16
    val chunkMask = (1L << chunkBits) - 1
    val sigCol =
      if (portableHash) simhashPortable(col(textCol), chunks * chunkBits)
      else simhash64(col(textCol))
    val withSig = df.select(col(idCol).as("id"), sigCol.as("sig"))
    val keyed = withSig.select(col("id"), col("sig"),
      explode(array((0 until chunks).map { j =>
        struct(lit(j).as("band"),
          shiftrightunsigned(col("sig"), j * chunkBits).bitwiseAND(lit(chunkMask)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    val counts = keyed.groupBy("band", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val sized = keyed.join(counts, Seq("band", "key"))
    val a = sized.select(col("band"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Driver-side scale fence for the EXACT all-pairs oracle paths.
    *
    * The exact pairwise operators ([[ngramJaccardPairs]],
    * [[embedCosinePairsExact]]) exist as LSH-RECALL ORACLES: their
    * joins are deliberately uncapped (a cap would bias the recall
    * measurement), so their cost is quadratic in the hottest key /
    * corpus size and they must never run on a full production corpus.
    * This fence makes that contract executable — the query fails
    * BEFORE the quadratic join is attempted, with the at-scale
    * alternative named in the message. One count() job on the (already
    * pruned) input frame; negligible next to the join it protects.
    */
  private[graft] def requireOracleScale(df: DataFrame, maxExactRows: Long,
                                        what: String, lshAlternative: String): DataFrame = {
    val n = df.count()
    require(n <= maxExactRows,
      s"$what is an exact all-pairs recall oracle fenced to <= $maxExactRows input rows " +
        s"(got $n); at scale run $lshAlternative and SAMPLE this oracle for recall measurement")
    df
  }

  /** Exact pairwise n-gram Jaccard via shingle-explode + equi-join on
    * the shingle value — every pair sharing ≥1 shingle is scored
    * exactly. This is the oracle-checkable exact counterpart of
    * [[minhashNearDups]]; at 100 TB you run the LSH variant and sample
    * this one for recall measurement — a contract enforced by the
    * `maxExactRows` fence ([[requireOracleScale]]): the shingle join
    * is deliberately uncapped (a bucket cap would bias the recall
    * oracle), so its hot-shingle cost is quadratic and the operator
    * refuses corpora beyond sample scale.
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxExactRows: Long = 100000L): DataFrame = {
    requireOracleScale(df, maxExactRows, "ngramJaccardPairs", "minhashNearDups")
    val base = scanParallelismFloor(df).select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val ex = base.select(col("id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val a = ex.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = ex.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, "sh").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count("*").as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs embedding cosine — the recall oracle for
    * [[embeddingNearDups]]'s hyperplane-LSH candidates. The join is a
    * deliberate full cross product (`id_a < id_b`) with NO bucket cap:
    * recall oracles must see every pair. Consequently it is fenced by
    * `maxExactRows` ([[requireOracleScale]]) — at 100 TB you run the
    * LSH variant and point this at a sampled slice.
    */
  def embedCosinePairsExact(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, maxExactRows: Long = 100000L): DataFrame = {
    val v = requireOracleScale(
      df.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v")),
      maxExactRows, "embedCosinePairsExact", "embeddingNearDups")
    val a = v.select(col("__id").as("id_a"), col("__v").as("va"))
    val b = v.select(col("__id").as("id_b"), col("__v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Connected components over a near-dup pair list: every node gets
    * the minimum reachable id as its cluster id — the canonicalization
    * step that turns pairwise matches into dedup clusters.
    *
    * Algorithm: min-label propagation WITH pointer doubling — each
    * round takes the min over {self, neighbors' labels, label's
    * label}. Round 1 (labels = min(self, min neighbor)) is folded
    * into the label initialization — one aggregation, no checkpoint
    * or convergence probe, since round 1 can never be the converged
    * round of a non-empty graph. The shortcut join halves label-chain
    * depth per round, so convergence is O(log diameter) rounds
    * instead of O(diameter): maxIter = 32 total rounds (init + up to
    * 31 probed rounds) covers diameters beyond 2^28 (a 300k-node
    * CHAIN — the StressSpec power-law worst case — settles in ~21
    * rounds: ~log2 diameter doubling rounds plus the 2 doubling-free
    * opening rounds and the final no-change round the convergence
    * probe needs to observe). The early-exit makes the higher cap
    * free for real dedup graphs, which converge in a handful of
    * rounds; plain propagation would silently truncate any chain
    * longer than maxIter. All joins are equi-joins on id/label
    * (hash-partitionable at any cluster size); labels never leave the
    * executors — the driver only reads the convergence flag.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                          maxIter: Int = 32): DataFrame = {
    // maxIter counts TOTAL rounds including the folded init round (the
    // loop below probes maxIter-1 rounds) — r14-advice: a caller
    // passing 1 would get zero probed rounds and an unconditional
    // not-converged warning, so require the minimum that makes the
    // parameter meaningful.
    require(maxIter >= 2, s"maxIter=$maxIter must be >= 2 " +
      "(the init round is folded in; at least one probed round is needed)")
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // EAGER fresh-stats checkpoint, not a lazy cache: a cached edge
    // frame still carries the whole upstream candidate build (at
    // scale, the MinHash/LSH pipeline) as a logical subtree into
    // every round's analyzed plan, which the driver re-plans per AQE
    // stage — the measured r14 driver-gap pathology (see
    // Graphs.pageRank). The checkpoint truncates each round to joins
    // over an ExistingRDD leaf; the candidate build runs exactly once.
    val edges = org.apache.spark.sql.graftbridge.CheckpointBridge
      .localCheckpointFreshStats(
        fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    // Round 1 folded into the initialization: the first propagation
    // round's fixpoint step is labels(id) = min(id, min neighbor) for
    // every node, and edges are symmetrized so every node appears as
    // src — one aggregation replaces a full round (checkpoint +
    // convergence probe). Round 1 can never BE the converged round on
    // a non-empty edge set (each edge's larger endpoint changes), so
    // no early exit is lost.
    var labels = edges.groupBy("src").agg(min(col("dst")).as("__mn"))
      .select(col("src").as("id"), least(col("src"), col("__mn")).as("label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter - 1) {
      val viaEdges = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      // pointer doubling: follow each node's label to THAT node's
      // label (labels are node ids, so this is a self-join on the
      // label frame) — chains compress exponentially. Engaged from
      // round 3 (loop index 1: the init above is round 1): shallow
      // graphs (the common dedup case) converge before paying the
      // extra join; deep chains still finish in O(log diameter)
      // rounds.
      val base = labels.select(col("id"), col("label")).union(viaEdges)
      val withShortcut =
        if (i < 1) base
        else base.union(labels.as("x")
          .join(labels.as("y"), col("x.label") === col("y.id"))
          .select(col("x.id").as("id"), col("y.label").as("label")))
      val next = withShortcut.groupBy("id").agg(min("label").as("label"))
      // ONE action per round, probe included: the changed flag rides
      // the eagerly checkpointed frame (which also bounds the
      // iterative-join lineage), and the convergence count is FUSED
      // into the checkpoint's own materialization job
      // (localCheckpointFreshStatsCountTrue) — r14 paid a separate
      // `isEmpty` job per round on top of the checkpoint job (worst on
      // the converged round, where take(1)'s scale-up scans every
      // block), ~0.1 s × rounds × 7 CC-backed queries (r14-verdict
      // item 2). fresh-stats checkpoint: labels enters this round's
      // plan four times (base ∪ viaEdges ∪ shortcut self-join ⨝ flag
      // join), so a stats-carrying localCheckpoint would ×4 the
      // inherited BigInt sizeInBytes every round — see
      // CheckpointBridge.
      val (flagged, nChanged) = org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointFreshStatsCountTrue(
          next.as("n").join(labels.as("o"), Seq("id"))
            .select(col("id"), col("n.label").as("label"),
                    (col("n.label") =!= col("o.label")).as("chg")),
          "chg")
      converged = nChanged == 0L
      labels = flagged.select("id", "label")
      i += 1
    }
    if (!converged)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"connectedComponents: not converged after $maxIter rounds — " +
          "clusters with diameter > maxIter are split; raise maxIter")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Benchmark decontamination: drop (tag) documents that share any
    * word n-gram with a benchmark/eval corpus — the standard
    * training-data hygiene step. Shape: explode shingles on BOTH
    * sides, distinct the benchmark side (small — eval sets are tiny
    * next to the corpus; Spark broadcasts it under the threshold),
    * semi-join to find contaminated ids, anti-join them away. Every
    * step is an equi-join on the shingle key — scale-safe.
    */
  def decontaminate(df: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String,
                    shingleSize: Int = 5): DataFrame = {
    val docSh = df.select(col(idCol), explode(wordShingles(col(textCol), shingleSize)).as("__sh"))
    val benchSh = benchmark
      .select(explode(wordShingles(col(textCol), shingleSize)).as("__sh")).distinct()
    val contaminated = docSh
      .join(benchSh, "__sh")
      .select(col(idCol)).distinct()
    df.join(contaminated, Seq(idCol), "left_anti")
  }

  /** FUZZY benchmark decontamination: drop corpus documents whose
    * n-gram Jaccard against ANY benchmark document reaches
    * `threshold` — the near-duplicate form of [[decontaminate]].
    * Exact shingle-overlap misses the paraphrased/lightly-edited
    * benchmark copies that actually leak eval sets into web corpora
    * (GPT-3 §4 / Dolma-style "fuzzy decontamination"); this catches
    * them with the SAME MinHash+LSH machinery as [[minhashNearDups]],
    * but joined CROSS-corpus: corpus band buckets against benchmark
    * band buckets, never corpus-vs-corpus.
    *
    * Scale shape: both sides shuffle only slim (id, band, key) rows;
    * the bucket cap applies to the CORPUS side (a boilerplate bucket
    * is the skew bomb — the benchmark side is bounded by the eval
    * suite's size, and AQE broadcasts it when it is small);
    * candidates verify with exact Jaccard via two slim shingle joins.
    * Recall follows the standard LSH curve: P[candidate] =
    * 1-(1-j^r)^b — near-certain at j ≥ 0.5 with the 128/32 defaults.
    */
  def minhashDecontaminate(
      df: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, seed: Long = graft.operators.Dedup.DefaultSeed,
      maxBucketSize: Int = 1000,
      portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands " +
        "(a remainder silently drops hashes from the band keys, degrading LSH recall)")
    val r = numHashes / bands
    def prep(src: DataFrame): DataFrame = {
      val base = scanParallelismFloor(src).select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleSize).as("shingles"))
      base.withColumn("sig",
        minhashSignature(col("shingles"), numHashes, seed, portableMd5 = portableHash))
    }
    def toBuckets(s: DataFrame, idName: String): DataFrame = s
      .select(col("id").as(idName),
        explode(bandKeys(col("sig"), bands, r, portable = portableHash)).as("bk"))
      .select(col(idName), col("bk.band"), col("bk.key"))
    val corpus = prep(df)
    val bench = prep(benchmark)
    val cb = toBuckets(corpus, "doc_id")
    val bb = toBuckets(bench, "bench_id")
    val counts = cb.groupBy("band", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val cbSized = cb.join(counts, Seq("band", "key"))
    val cand = cbSized.join(bb, Seq("band", "key"))
      .select("doc_id", "bench_id").dropDuplicates("doc_id", "bench_id")
    val shC = corpus.select(col("id").as("doc_id"), col("shingles").as("sh_a"))
    val shB = bench.select(col("id").as("bench_id"), col("shingles").as("sh_b"))
    val contaminated = cand.join(shC, "doc_id").join(shB, "bench_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("inter") / col("uni") >= threshold)
      .select(col("doc_id").as(idCol)).distinct()
    df.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Incremental batch dedup against a persisted fingerprint index —
    * the "daily ingest" pattern: drop new documents whose normalized-
    * text fingerprint already exists in the index. Returns the
    * deduplicated batch.
    *
    * The survivors' fingerprints are NOT appended here: call
    * [[commitFingerprints]] only AFTER the batch has been durably
    * written downstream. Appending inside this call would make the
    * operation non-idempotent — a failed downstream write that
    * retries would find its own fingerprints already indexed, the
    * anti-join would drop every document, and the batch would be
    * silently lost.
    *
    * Scale shape: the index is a plain parquet table of fingerprints;
    * the membership test is a hash-partitioned `left_anti` equi-join
    * (no driver-side set, no broadcast of the corpus-sized index).
    * Within-batch duplicates collapse first via the same one-shuffle
    * group-by that [[exact]] uses. For the unbounded-stream form of
    * this, see [[graft.streaming.EventStream.dedupStream]].
    *
    * Durability: by default the result is pinned with
    * `localCheckpoint` — blocks live in EXECUTOR storage only, so
    * losing an executor between this call and the caller's durable
    * downstream write fails the whole batch unrecoverably (the
    * truncated lineage cannot recompute lost blocks). That is the
    * right trade on a healthy cluster (no extra I/O round-trip);
    * for very large batches or preemptible executors pass
    * `stagingPath = Some(dir)` to stage the survivors through a
    * durable parquet write instead — the returned frame then re-reads
    * from storage and ANY task loss replays from disk. The staging
    * dir is the caller's to clean after its downstream commit.
    */
  def incrementalExact(newDocs: DataFrame, textCol: String, idCol: String,
                       indexPath: String,
                       stagingPath: Option[String] = None): DataFrame = {
    val spark = newDocs.sparkSession
    val fp = newDocs.withColumn("__fp", fingerprint(col(textCol)))
    // collapse within-batch dups: keep the min-id representative
    val firstPerFp = fp.groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .join(fp, Seq("__fp", idCol))
    val indexExists = {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      // session conf, NOT a bare Configuration: spark.hadoop.* (e.g.
      // fs.defaultFS, object-store credentials) must resolve the SAME
      // filesystem spark.read below uses, or the existence check
      // silently consults the wrong store and dedup never engages
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val fresh =
      if (!indexExists) firstPerFp
      else {
        val index = spark.read.parquet(indexPath).select(col("fingerprint").as("__fp"))
        firstPerFp.join(index, Seq("__fp"), "left_anti")
      }
    // Materialized so the caller's later actions (including the
    // commit) never re-run the anti-join against a changed index.
    // localCheckpoint = executor-local (fast, volatile); stagingPath =
    // durable parquet round-trip (survives executor loss) — see
    // the Durability note above.
    stagingPath match {
      case Some(dir) =>
        fresh.drop("__fp").write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None =>
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .localCheckpointFreshStats(fresh).drop("__fp")
    }
  }

  /** Record a durably-written batch's fingerprints in the index —
    * the commit half of [[incrementalExact]]; idempotency contract:
    * call exactly once per SUCCESSFULLY persisted batch.
    */
  def commitFingerprints(docs: DataFrame, textCol: String, indexPath: String): Unit =
    docs.select(fingerprint(col(textCol)).as("fingerprint"))
      .write.mode("append").parquet(indexPath)

  /** Incremental NEAR-dup dedup against a persisted MinHash-LSH index
    * — the fuzzy counterpart to [[incrementalExact]] for the daily-
    * ingest pattern: drop new documents that near-duplicate EITHER a
    * same-batch document (exact-Jaccard verified, keep-lowest-id) or
    * an already-indexed one. Returns the surviving rows of `newDocs`.
    *
    * Index layout (parquet under `indexPath`): `bands/` holds the slim
    * (band, key, doc_id) LSH bucket rows; `sigs/` holds one
    * (doc_id, sig) row per indexed document. Indexed documents' raw
    * text is NOT retained, so the cross-batch verification uses the
    * standard signature-agreement Jaccard estimate (matching minhash
    * fraction; unbiased, ±1/√numHashes) rather than exact shingle
    * Jaccard — the trade that keeps the index O(docs), not O(corpus
    * text).
    *
    * Scale shape: candidate generation is an equi-join of the NEW
    * batch's bucket rows against the index's (both slim), with the
    * same `maxBucketSize` cap on index buckets every LSH path here
    * uses; signatures join once per candidate id. Same
    * commit-after-write contract as [[incrementalExact]]
    * ([[commitMinhash]] appends survivors only AFTER the caller's
    * durable downstream write), and the same localCheckpoint /
    * stagingPath durability trade.
    */
  def incrementalMinhash(newDocs: DataFrame, textCol: String, idCol: String,
                         indexPath: String,
                         shingleSize: Int = 5, numHashes: Int = 128,
                         bands: Int = 32, threshold: Double = 0.7,
                         seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000,
                         stagingPath: Option[String] = None,
                         portableHash: Boolean = false): DataFrame =
    incrementalMinhashImpl(newDocs, textCol, idCol, indexPath, shingleSize,
      numHashes, bands, threshold, seed, maxBucketSize, stagingPath,
      portableHash, overlappedWork = None)

  /** [[incrementalMinhash]] with an independent unit of driver work —
    * in the intended use, the PREVIOUS batch's [[commitMinhash]] —
    * overlapped behind this batch's within-batch candidate build
    * (guide §2.6 job overlap): the within-batch near-dup phase depends
    * only on `newDocs`, while the overlapped work only WRITES the
    * index, and the barrier sits before this batch's first index READ
    * — so `incrementalMinhashOverlapping(b2, …, work = commit(s1))`
    * computes exactly what `{ commit(s1); incrementalMinhash(b2, …) }`
    * computes, with the commit's write jobs backfilling the candidate
    * build's inter-stage driver gaps. Exceptions from either side
    * rethrow (same failure surface as the sequential form).
    */
  private[graft] def incrementalMinhashOverlapping(
      newDocs: DataFrame, textCol: String, idCol: String,
      indexPath: String,
      shingleSize: Int = 5, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.7,
      seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000,
      stagingPath: Option[String] = None,
      portableHash: Boolean = false)(work: () => Unit): DataFrame =
    incrementalMinhashImpl(newDocs, textCol, idCol, indexPath, shingleSize,
      numHashes, bands, threshold, seed, maxBucketSize, stagingPath,
      portableHash, overlappedWork = Some(work))

  private def incrementalMinhashImpl(newDocs: DataFrame, textCol: String, idCol: String,
                         indexPath: String,
                         shingleSize: Int, numHashes: Int,
                         bands: Int, threshold: Double,
                         seed: Long, maxBucketSize: Int,
                         stagingPath: Option[String],
                         portableHash: Boolean,
                         overlappedWork: Option[() => Unit]): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands " +
        "(a remainder silently drops hashes from the band keys, degrading LSH recall)")
    val spark = newDocs.sparkSession
    val r = numHashes / bands
    // within-batch near-dups: exact-verified pairs, keep the lowest id
    val batchPairs = minhashNearDups(newDocs, textCol, idCol,
      shingleSize, numHashes, bands, threshold, seed, maxBucketSize, portableHash)
    val batchDrops = batchPairs.select(col("id_b").as(idCol)).distinct()
    val batchSurvivorsRaw = newDocs.join(batchDrops, Seq(idCol), "left_anti")

    // Overlap point: materialize the within-batch survivors (the whole
    // minhash chain) WHILE the caller's independent work — the previous
    // batch's index commit — runs on a second thread. The barrier
    // (inParallel joins both) is crossed before the index-existence
    // check and every index read below.
    val survivorsPre = overlappedWork.map { work =>
      val (ck, _) = Graphs.inParallel(
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .localCheckpointFreshStats(batchSurvivorsRaw),
        work())
      ck
    }

    val bandsPath = s"$indexPath/bands"
    val indexExists = {
      val p = new org.apache.hadoop.fs.Path(bandsPath)
      // session conf, not a bare Configuration — see incrementalExact
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val fresh =
      if (!indexExists) survivorsPre.getOrElse(batchSurvivorsRaw) // materialized once by the exit checkpoint (overlap mode: already materialized behind the overlapped work)
      else {
        // Eager checkpoint: the survivors frame embeds the whole
        // within-batch minhash chain, and the index path references it
        // TWICE (the signature pass and the final anti-join) — without
        // the checkpoint the chain is re-planned and re-executed per
        // reference (the r14 duplicated-subtree pathology; see
        // connectedComponents). Only on the index path: the fresh-index
        // batch is materialized exactly once at exit, so a checkpoint
        // here would be a second full copy of the same rows. In overlap
        // mode the checkpoint already happened concurrently with the
        // overlapped work — reuse it.
        val batchSurvivors = survivorsPre.getOrElse(
          org.apache.spark.sql.graftbridge.CheckpointBridge
            .localCheckpointFreshStats(batchSurvivorsRaw))
        val sigs = batchSurvivors.select(
          col(idCol).as("id"),
          minhashSignature(wordShingles(col(textCol), shingleSize), numHashes, seed,
            portableMd5 = portableHash).as("sig"))
        val newBuckets = sigs
          .select(col("id"), explode(bandKeys(col("sig"), bands, r, portable = portableHash)).as("bk"))
          .select(col("id"), col("bk.band"), col("bk.key"))
        val idxBuckets = spark.read.parquet(bandsPath)
        // cap degenerate INDEX buckets (a boilerplate bucket that grew
        // huge across many committed batches) — recall-for-safety,
        // same rationale as the batch-mode cap
        val okBuckets = idxBuckets.groupBy("band", "key")
          .agg(count("*").as("bucket_n"))
          .filter(col("bucket_n") <= maxBucketSize)
          .select("band", "key")
        val idxSized = idxBuckets.join(okBuckets, Seq("band", "key"))
          .select(col("band"), col("key"), col("doc_id").as("old_id"))
        val cand = newBuckets.join(idxSized, Seq("band", "key"))
          .select(col("id"), col("old_id")).dropDuplicates("id", "old_id")
        val oldSigs = spark.read.parquet(s"$indexPath/sigs")
          .select(col("doc_id").as("old_id"), col("sig").as("old_sig"))
        val newSigs = sigs.select(col("id"), col("sig").as("new_sig"))
        val est = cand.join(newSigs, "id").join(oldSigs, "old_id")
          .withColumn("match_n",
            expr("aggregate(zip_with(new_sig, old_sig, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
          .filter(col("match_n") >= math.ceil(threshold * numHashes).toInt)
        val indexDrops = est.select(col("id").as(idCol)).distinct()
        batchSurvivors.join(indexDrops, Seq(idCol), "left_anti")
      }
    stagingPath match {
      case Some(dir) =>
        fresh.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None =>
        org.apache.spark.sql.graftbridge.CheckpointBridge
          .localCheckpointFreshStats(fresh)
    }
  }

  /** Record a durably-written batch in the MinHash index — the commit
    * half of [[incrementalMinhash]]; call exactly once per
    * SUCCESSFULLY persisted batch (same idempotency contract as
    * [[commitFingerprints]]). Parameters must match the query half.
    */
  def commitMinhash(docs: DataFrame, textCol: String, idCol: String,
                    indexPath: String,
                    shingleSize: Int = 5, numHashes: Int = 128,
                    bands: Int = 32, seed: Long = graft.operators.Dedup.DefaultSeed,
                    portableHash: Boolean = false): Unit = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands (must match the query half)")
    val r = numHashes / bands
    val sigs = docs.select(
      col(idCol).as("doc_id"),
      minhashSignature(wordShingles(col(textCol), shingleSize), numHashes, seed,
        portableMd5 = portableHash).as("sig"))
      .localCheckpoint(eager = true) // one signature pass feeds both writes
    // The two index writes are deliberately SEQUENTIAL, sigs strictly
    // before bands (r14-advice fix: the r14 overlap could commit bands
    // rows whose doc_id has no sigs row if the sigs write failed after
    // the bands write landed — such orphans silently drop candidates
    // at incrementalMinhash's inner oldSigs join, degrading recall
    // with no error; sigs-without-bands, the order restored here, is
    // harmless — unreferenced rows). The r14 throughput idea survives
    // one level up: [[incrementalMinhashOverlapping]] overlaps the
    // WHOLE commit behind the next batch's within-batch build.
    sigs.write.mode("append").parquet(s"$indexPath/sigs")
    sigs.select(col("doc_id"),
        explode(bandKeys(col("sig"), bands, r, portable = portableHash)).as("bk"))
      .select(col("bk.band"), col("bk.key"), col("doc_id"))
      .write.mode("append").parquet(s"$indexPath/bands")
    ()
  }

  /** Seeded random hyperplanes for cosine LSH, baked as plan literals. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = graft.operators.Dedup.DefaultSeed): Seq[Seq[Double]] = {
    val rng = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sentinel `nPlanes` value meaning "derive the hyperplane key depth
    * from the corpus" — the DEFAULT for every hyperplane-bucketed
    * operator ([[graft.operators.Similarity.knnGraph]],
    * [[embeddingNearDups]], [[embeddingDecontaminate]]). The r11 30×
    * scale curve measured why a fixed default is a scale trap: at a
    * pinned depth the candidate stage is density-quadratic BELOW the
    * bucket cap (Σ m² grows as n²/2^depth while every bucket stays
    * under the cap, so the cap never engages) — the same corpus built
    * 16× faster at depth 12 than at depth 8. Pin an explicit positive
    * depth to reproduce a fixed constant family (the oracle queries
    * do); leave the default to get a depth that tracks corpus size.
    */
  val AutoPlanes: Int = 0

  /** Hyperplane key-depth cap: 62 sign bits must fit a long bucket
    * key, and 2^30 keys/table already exceeds any real verify budget.
    */
  val MaxPlanes: Int = 30

  /** Scale-safe hyperplane key depth for a corpus of `n` vectors: the
    * smallest depth that keeps EXPECTED bucket occupancy n / 2^depth
    * at or under `targetOccupancy`, floored at the operator's
    * recall-motivated `minPlanes` and capped at [[MaxPlanes]]. Exact
    * integer arithmetic (ceil-division + ceil-log2 via
    * numberOfLeadingZeros), so the derived depth — and therefore the
    * plane literals and every downstream bucket — is bit-deterministic
    * in (n, minPlanes, targetOccupancy) on any JVM.
    *
    * targetOccupancy = 16 is calibrated on the r11 curve: 60k vectors
    * derive depth 12 (the measured 16×-faster point vs the old fixed
    * 8), the 500-vector oracle corpora derive under the floor (so
    * auto = minPlanes = the committed constants), and 10⁹ vectors
    * derive 26 — expected per-bucket work stays O(targetOccupancy²)
    * per table regardless of corpus size, with `nTables` multi-probe
    * carrying recall.
    */
  def derivedPlanes(n: Long, minPlanes: Int, targetOccupancy: Int = 16): Int = {
    require(minPlanes >= 1 && minPlanes <= MaxPlanes,
      s"minPlanes must be in [1, $MaxPlanes], got $minPlanes")
    require(targetOccupancy >= 1, s"targetOccupancy must be positive, got $targetOccupancy")
    val buckets = if (n <= 0) 1L else (n + targetOccupancy - 1) / targetOccupancy
    val needed =
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1) // ceil(log2)
    math.min(MaxPlanes, math.max(minPlanes, needed))
  }

  /** Resolve a caller-supplied `nPlanes` ([[AutoPlanes]] = derive from
    * one cheap corpus `count()`; positive = pinned) — shared by every
    * hyperplane operator so the auto policy cannot drift between them.
    * The count is the only extra job and reads no vector bytes beyond
    * parquet row-group metadata when the source supports count pushdown.
    */
  private[operators] def resolvePlanes(nPlanes: Int, corpus: DataFrame, minPlanes: Int): Int = {
    require(nPlanes == AutoPlanes || (nPlanes >= 1 && nPlanes <= MaxPlanes),
      s"nPlanes must be $AutoPlanes (auto) or in [1, $MaxPlanes], got $nPlanes")
    if (nPlanes != AutoPlanes) nPlanes else derivedPlanes(corpus.count(), minPlanes)
  }

  /** Embedding near-dup: bucket by the packed sign-bit signature of
    * `nPlanes` random hyperplanes, then verify candidates with exact
    * cosine. Multi-probe via `nTables` independent plane sets raises
    * recall. Returns (id_a, id_b, cosine) pairs with cosine >= threshold.
    *
    * `nPlanes` defaults to [[AutoPlanes]]: the depth is derived from
    * one cheap corpus count ([[derivedPlanes]], floor 12) so a
    * default-parameter call stays scale-safe — at a FIXED depth the
    * candidate stage grows density-quadratically below the bucket cap
    * (the r11 30× curve). Pin a positive depth to reproduce a fixed
    * constant family.
    */
  def embeddingNearDups(
      df: DataFrame, vecCol: String, idCol: String, dim: Int,
      threshold: Double = 0.95, nPlanes: Int = AutoPlanes, nTables: Int = 4,
      seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val base = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val depth = resolvePlanes(nPlanes, base, minPlanes = 12)
    val planes = (0 until nTables).map(t => randomPlanes(depth, dim, seed + t))
    val keyed = base.withColumn("buckets",
      column(graft.plans.HyperplaneBuckets(expression(col("v")), planes)))
    // Buckets carry ONLY (id, table, key): the explode multiplies rows
    // by nTables, so shuffling the (dim-sized) vectors through it would
    // multiply shuffle bytes nTables×. Vectors rejoin later, once per
    // candidate id, not per bucket row.
    val buckets = keyed.select(col("id"), posexplode(col("buckets")).as(Seq("table", "key")))
    // Cap degenerate buckets: duplicate or near-zero vectors all hash
    // to one sign pattern, and a size-m bucket yields m² candidate
    // pairs — a skew bomb at scale. Dropped mega-buckets only cost
    // recall on pairs the other tables still catch.
    val counts = buckets.groupBy("table", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val sized = buckets.join(counts, Seq("table", "key"))
    val a = sized.select(col("table"), col("key"), col("id").as("id_a"))
    val b = sized.select(col("table"), col("key"), col("id").as("id_b"))
    val cand = a.join(b, Seq("table", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val vA = base.select(col("id").as("id_a"), col("v").as("v_a"))
    val vB = base.select(col("id").as("id_b"), col("v").as("v_b"))
    cand.join(vA, "id_a").join(vB, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** EMBEDDING-space benchmark decontamination: drop corpus rows whose
    * embedding-cosine against ANY benchmark/eval row reaches
    * `threshold` — the semantic form of [[minhashDecontaminate]].
    * N-gram methods miss the translated/re-generated/paraphrased eval
    * leaks that share no surface text; this catches anything the
    * embedding model maps near an eval item (the decontamination mode
    * of SemDeDup / DataComp-style pipelines).
    *
    * Shape: both sides bucket with the SAME seeded hyperplane tables
    * as [[embeddingNearDups]] (plan-literal planes, multi-probe over
    * `nTables` tables), joined CROSS-corpus only — corpus buckets vs
    * benchmark buckets, never corpus-vs-corpus. Only slim
    * (id, table, key) rows ride the explode+shuffle; vectors rejoin
    * once per surviving candidate pair for the exact-cosine verify.
    * The bucket cap applies to the CORPUS side (the benchmark is
    * bounded by the eval suite's size; a degenerate corpus bucket is
    * the m·|bench| candidate bomb). Recall follows the LSH curve over
    * the table count; a missed pair costs recall, never correctness
    * of surviving rows. Returns `corpus` survivors unchanged.
    */
  def embeddingDecontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      vecCol: String, idCol: String, dim: Int,
      threshold: Double = 0.8, nPlanes: Int = AutoPlanes, nTables: Int = 8,
      seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // auto depth sizes to the CORPUS (the side the bucket cap guards
    // and the side that grows to 100 TB); the benchmark is eval-sized
    val depth = resolvePlanes(nPlanes,
      corpus.select(col(idCol)), minPlanes = 8)
    val planes = (0 until nTables).map(t => randomPlanes(depth, dim, seed + t))
    def toBuckets(df: DataFrame, idName: String): DataFrame = df
      .select(col(idCol).as(idName), col(vecCol).cast("array<double>").as("v"))
      .withColumn("buckets",
        column(graft.plans.HyperplaneBuckets(expression(col("v")), planes)))
      .select(col(idName), posexplode(col("buckets")).as(Seq("table", "key")))
    val cb = toBuckets(corpus, "cid")
    val bb = toBuckets(benchmark, "bid")
    val ok = cb.groupBy("table", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .select("table", "key")
    val cand = cb.join(ok, Seq("table", "key")).join(bb, Seq("table", "key"))
      .select("cid", "bid").dropDuplicates("cid", "bid")
    val vC = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("v_c"))
    val vB = benchmark.select(col(idCol).as("bid"), col(vecCol).cast("array<double>").as("v_b"))
    val contaminated = cand.join(vC, "cid").join(vB, "bid")
      .filter(cosine(col("v_c"), col("v_b")) >= threshold)
      .select(col("cid").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings into k-means cells, compute
    * pairwise cosine ONLY within a cell, and keep one representative
    * (the lowest id) of every semantic-duplicate pair. Returns the
    * SURVIVORS as (id, cell_id).
    *
    * This is the data-adaptive complement to [[embeddingNearDups]]:
    * hyperplane buckets are oblivious to the data distribution, while
    * k-means cells follow it — the published algorithm for trimming
    * web-scale image/text corpora (LAION) by semantic similarity.
    *
    * Scale shape: centroids come from [[Similarity.kmeansCentroids]]
    * (bounded-heap seeded, no corpus shuffle); assignment is a NARROW
    * map with the centroid matrix as a plan literal; the within-cell
    * self-join shuffles only (id, cell_id) and is capped by
    * `maxCellSize` — the same skew-bomb guard as every LSH path here
    * (an over-full cell at 100 TB means nCells is too small; the cap
    * degrades recall, never blows up a task). Vectors rejoin once per
    * candidate pair, not per cell row. With `portableSeed = true` and
    * `lloydIters = 0` the whole pipeline is bit-replicable by the
    * DuckDB oracle (same contract as `ann_ivf_topk`).
    */
  def semanticDedup(
      df: DataFrame, vecCol: String, idCol: String,
      nCells: Int = 16, threshold: Double = 0.95,
      lloydIters: Int = 2, portableSeed: Boolean = false,
      maxCellSize: Int = 10000): DataFrame = {
    // parameter errors fail BEFORE any Spark job runs (nCells = 0
    // would silently lump the corpus into one phantom cell)
    require(nCells > 0, s"nCells=$nCells must be positive")
    require(maxCellSize > 0, s"maxCellSize=$maxCellSize must be positive")
    require(lloydIters >= 0, s"lloydIters=$lloydIters must be >= 0")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val base = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val cents = Similarity.kmeansCentroids(
      base.select(col("id").as("corpus_id"), col("v").as("cv")),
      nCells, lloydIters, portableSeed)
    val assigned = base.withColumn("cell_id",
      column(graft.plans.NearestCentroid(expression(col("v")), cents.toSeq.map(_.toSeq))))
    val slim = assigned.select("id", "cell_id")
    val counts = slim.groupBy("cell_id").agg(count("*").as("cell_n"))
      .filter(col("cell_n") <= maxCellSize)
    val sized = slim.join(counts, Seq("cell_id"))
    val a = sized.select(col("cell_id"), col("id").as("id_a"))
    val b = sized.select(col("cell_id"), col("id").as("id_b"))
    // no dropDuplicates here, unlike the multi-table LSH paths: each
    // id lives in exactly ONE cell, so the single-key self-join cannot
    // emit a pair twice — deduping would only add a shuffle over the
    // largest intermediate in the pipeline
    val cand = a.join(b, Seq("cell_id")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val vA = base.select(col("id").as("id_a"), col("v").as("v_a"))
    val vB = base.select(col("id").as("id_b"), col("v").as("v_b"))
    val dupPairs = cand.join(vA, "id_a").join(vB, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
    // keep-lowest-id: any id that appears as the larger side of a
    // duplicate pair is dropped; its lower partner survives (or is
    // itself dropped by a yet-lower partner — either way one
    // representative of every duplicate chain remains)
    val drops = dupPairs.select(col("id_b").as("id")).distinct()
    assigned.join(drops, Seq("id"), "left_anti").select("id", "cell_id")
  }

  /** Near-dup pairs over a PRECOMPUTED packed-bit signature column —
    * the signature-agnostic core behind every Hamming-space dedup:
    * feed it [[Multimodal.imageDHash]] for perceptual image dedup,
    * [[graft.plans.HyperplaneBuckets]] sign bits for embeddings, or
    * any external 64-bit fingerprint. [[simhashNearDups]] is the
    * text-specific sibling that also OWNS its signature; this one
    * decouples signature production from candidate generation so a
    * signature computed once (e.g. persisted next to the binary
    * payload at ingest) can be reused across dedup runs without
    * re-decoding terabytes of media.
    *
    * Same scale shape as simhash: split the `nBits` signature into
    * `bands` contiguous chunks and equi-join per chunk. For
    * `maxHamming < bands` the result is COMPLETE — two signatures
    * within that distance must agree on ≥1 chunk (pigeonhole). For
    * larger `maxHamming` banding becomes a recall-bounded candidate
    * generator (P[some chunk clean] ≥ 1 − (d/bands)^... computable
    * from the distance d and chunk layout) — the standard operating
    * point when the duplicate radius exceeds the band count and an
    * exact guarantee would need degenerate chunk widths. Buckets over
    * `maxBucketSize` are dropped (skew cap — a million identical
    * images must not become a 10^12-pair task), candidates verify
    * with `bit_count(xor)`, and only (id, band, key) rows ever
    * shuffle.
    */
  def hammingNearDups(
      df: DataFrame, sigCol: String, idCol: String,
      nBits: Int, bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    require(nBits >= 1 && nBits <= 64, s"nBits=$nBits must be 1..64")
    require(bands >= 1 && nBits % bands == 0,
      s"nBits=$nBits must be divisible by bands=$bands (equal-width chunks)")
    require(maxHamming >= 0 && maxHamming <= nBits,
      s"maxHamming=$maxHamming outside [0, $nBits]")
    val chunkBits = nBits / bands
    val chunkMask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val withSig = df.select(col(idCol).as("id"), col(sigCol).cast("long").as("sig"))
      .filter(col("sig").isNotNull) // undecodable media ⇒ no signature ⇒ not a candidate
    val keyed = withSig.select(col("id"), col("sig"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"),
          shiftrightunsigned(col("sig"), j * chunkBits).bitwiseAND(lit(chunkMask)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    val counts = keyed.groupBy("band", "key").agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
    val sized = keyed.join(counts, Seq("band", "key"))
    val a = sized.select(col("band"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Verify-threshold advisor — the missing dial next to
    * [[minhashBandProfile]] (candidate work) and
    * [[minhashRecallProfile]] (banding recall): the HISTOGRAM of exact
    * Jaccard over the capped LSH candidate pairs, i.e. where the
    * corpus' similarity mass actually sits. Real corpora are bimodal
    * (a near-1.0 duplicate mode and a low-overlap background); the
    * valley between them is the defensible `threshold`, and this
    * measures it instead of assuming 0.7. Runs the identical
    * signature/banding/cap chain as [[minhashNearDups]] with the
    * verify threshold OPEN (0.0), then bins the verified scores.
    *
    * Scale shape: exactly one [[minhashNearDups]] pass (same capped
    * candidate volume, same slim shuffles) plus a ≤ `bins`-row rollup;
    * the share windows run on that tiny table. Determinism: jaccard is
    * an integer-ratio double and binning/share are fixed-shape
    * arithmetic on it.
    */
  def jaccardThresholdProfile(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = graft.operators.Dedup.DefaultSeed, maxBucketSize: Int = 1000,
      portableHash: Boolean = false, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    val rd = graft.functions.MathFunctions.roundTo _
    val pairs = minhashNearDups(df, textCol, idCol, shingleSize, numHashes,
      bands, threshold = 0.0, seed, maxBucketSize, portableHash)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    pairs.select(least(floor(col("jaccard") * lit(bins)).cast("int"),
        lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count("*").as("n_pairs"))
      .select(col("bin"),
        (col("bin").cast("double") / lit(bins.toDouble)).as("lo"),
        ((col("bin").cast("double") + lit(1.0)) / lit(bins.toDouble)).as("hi"),
        col("n_pairs"),
        rd(col("n_pairs").cast("double") /
          sum("n_pairs").over(w).cast("double"), 6).as("share"))
      .orderBy("bin")
  }

  /** Sorted-neighborhood near-dup pairs (the merge/purge blocking
    * family, Hernández & Stolfo 1995) — the third candidate-generation
    * strategy next to MinHash banding and hyperplane buckets: sort the
    * corpus by a blocking key (here the first `keyLen` chars of the
    * normalized text), slide a `window`-row neighborhood down the
    * sorted order, and exact-Jaccard-verify only rank-adjacent pairs.
    * Catches the prefix-similar duplicates a banding scheme can miss
    * when edits concentrate late in the document, and its candidate
    * volume is EXACTLY n·(window−1) pairs — no bucket-skew tail at
    * all, so no cap parameter to tune.
    *
    * Scale shape: the global order costs ONE range exchange (the same
    * exchange any distributed sort pays) and ranks come from
    * `zipWithIndex` over the range-partitioned frame — partition p's
    * keys all precede partition p+1's, so partition-index numbering IS
    * the global (key, id) rank, with no single-partition window
    * anywhere. The neighborhood join is a pure equi-join: row at rank
    * r posts to buckets {r div w, r div w + 1} on one side and
    * {r div w} on the other, and any pair at rank distance 1..w−1
    * spans at most adjacent buckets, so each candidate matches exactly
    * once. The row's shingle array rides that shuffle as payload and
    * the exact Jaccard is computed inside the join — re-joining
    * arrays onto the pair frontier afterwards sorted pair-count ×
    * array rows and was 98% of the x100 wall (r14, see
    * [[sortedNeighborhoodStaged]]); only slim scored triples shuffle
    * after the pass.
    *
    * Determinism: rank order is (key, id) with a unique id, and the
    * key is the HEX form of the normalized prefix's UTF-8 bytes —
    * pure ASCII on any input, so the sort ORDER is byte-portable:
    * Spark's UTF8 binary sort and an oracle engine's default collation
    * order the hex strings identically (hex string order ≡ byte order
    * of the original prefix). Caveat (ADVICE r13): the key CONTENT
    * still goes through each engine's `substring`, which Spark counts
    * in code points while some engines count grapheme clusters — a
    * prefix boundary falling inside a combining sequence could select
    * different bytes per engine. [[normalizeText]]'s lowercase +
    * whitespace-collapse does not strip combining marks, so the
    * portability claim is exact for ASCII/NFC-without-combining-suffix
    * corpora and best-effort beyond that; the engine's own results are
    * deterministic for any input either way.
    * Jaccard is an integer-ratio double. Returns (id_a, id_b,
    * jaccard) with id_a < id_b (ids are least/greatest-normalized:
    * rank order and id order can disagree). Note: the rank is
    * materialized via `zipWithIndex`, which runs one eager job at
    * call time.
    */
  def sortedNeighborhoodNearDups(
      df: DataFrame, textCol: String, idCol: String,
      window: Int = 10, keyLen: Int = 24, shingleSize: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    require(keyLen >= 1, s"keyLen=$keyLen must be >= 1")
    sortedNeighborhoodNearDupsMultiKey(df, textCol, idCol,
      Seq(hex(substring(normalizeText(col(textCol)), 1, keyLen))),
      window, shingleSize, threshold)
  }

  /** Multi-pass sorted-neighborhood near-dup pairs — the classic
    * merge/purge deployment (Hernández & Stolfo 1995 run their method
    * with SEVERAL independent blocking keys and union the results): a
    * single pass misses duplicate pairs whose edits hit the blocking
    * key itself (a prefix key cannot neighbor two documents that
    * differ in their first words, however identical the rest). Each
    * `keyExprs` entry drives one independent rank-and-window pass;
    * each pass scores its pairs with exact Jaccard inside the
    * neighborhood join, and the surviving pairs union across passes
    * and deduplicate, so a pair blocked by k passes is emitted once.
    *
    * The default two-pass configuration ([[sortedNeighborhoodMultiPass]])
    * pairs the normalized-prefix key with the REVERSED-text prefix
    * (i.e. the suffix read backwards): edits concentrated early in the
    * document leave the suffix key intact and vice versa, so the two
    * passes cover each other's blind spot.
    *
    * Scale shape: per pass, exactly the single-pass plan — one range
    * exchange over (id, key, shingles) rows, zipWithIndex rank,
    * bucket equi-join with candidate volume EXACTLY n·(window−1),
    * scored in place — then the threshold filter and one cross-pass
    * distinct over the SURVIVING slim (id_a, id_b, jaccard) triples
    * (the only post-pass shuffle). Total candidate volume is
    * ≤ k·n·(window−1): still linear in n, still no skew tail, no cap
    * to tune; nothing fat is ever sorted by pair count (see
    * [[sortedNeighborhoodStaged]] for the r14 profile that forced
    * this shape).
    *
    * Key expressions should be engine-portable ASCII (wrap prefixes in
    * `hex(...)` — see [[sortedNeighborhoodNearDups]]'s determinism
    * note). Returns (id_a, id_b, jaccard), id_a < id_b, each pair once.
    */
  def sortedNeighborhoodNearDupsMultiKey(
      df: DataFrame, textCol: String, idCol: String,
      keyExprs: Seq[Column], window: Int = 10, shingleSize: Int = 3,
      threshold: Double = 0.3): DataFrame =
    sortedNeighborhoodStaged(df, textCol, idCol, keyExprs, window,
      shingleSize, threshold)._3

  /** Stage frontiers of [[sortedNeighborhoodNearDupsMultiKey]] for the
    * per-stage scale profile (`tools/SnmProfile`, the KnnProfile
    * treatment the r13 verdict asked for): (scored candidate union —
    * every rank-window pair with its exact Jaccard, pre-threshold;
    * surviving pairs — post-threshold, pre-dedup; verified result —
    * cross-pass deduped). The third element IS the operator's result —
    * the public method delegates here, so the profiled stages are the
    * shipped plan, not a reconstruction.
    *
    * r14 redesign (the knn r13 lesson applied to the SNM family):
    * the r13 shape deduped SLIM pairs first and then re-joined the
    * pair frontier with the fat shingle arrays twice to verify.
    * SNM_PROFILE_r14 localized 98% of the x100 tail (201 of 206 s)
    * in exactly those verify joins — a SortMergeJoin sorting ~9M
    * pair×array rows spilled 13.8 GB memory / 5.6 GB disk in one
    * 32-thread JVM, while candidates + distinct together cost 4.7 s
    * with ZERO spill. Now the shingle arrays ride the RANK rows as
    * shuffle payload (computed once in the scan projection) and the
    * exact-Jaccard verify happens INSIDE the neighborhood bucket
    * join; only (id_a, id_b, jaccard) triples ever cross a shuffle
    * afterwards, and the threshold filter runs BEFORE the cross-pass
    * distinct so the one remaining exchange carries only surviving
    * pairs (25.6k of 9M candidates at the x100 point). Fat-row
    * traffic drops from 2·|pairs| join-sorted rows to ≤ 4·n
    * straight-through rows per pass, and nothing fat is ever sorted
    * by pair count.
    */
  def sortedNeighborhoodStaged(
      df: DataFrame, textCol: String, idCol: String,
      keyExprs: Seq[Column], window: Int = 10, shingleSize: Int = 3,
      threshold: Double = 0.3): (DataFrame, DataFrame, DataFrame) = {
    require(window >= 2, s"window=$window must be >= 2 (a 1-row neighborhood has no pairs)")
    require(keyExprs.nonEmpty, "at least one blocking-key expression is required")
    val spark = df.sparkSession
    val w = window.toLong
    // One rank-and-window pass: global (skey, id) rank without a
    // global window — range-exchange orders the partitions,
    // sortWithinPartitions orders the rows, zipWithIndex numbers them
    // in partition-index order (partition p's keys all precede
    // partition p+1's). Row at rank r posts to buckets
    // {r div w, r div w + 1} on one side and {r div w} on the other:
    // any pair at rank distance 1..w−1 spans at most adjacent buckets
    // and matches exactly once — and is SCORED right here, while both
    // rows' shingle arrays are in hand.
    def passScored(keyExpr: Column): DataFrame = {
      val ordered = df.select(col(idCol).as("id"), keyExpr.as("skey"),
          wordShingles(col(textCol), shingleSize).as("shingles"))
        .repartitionByRange(col("skey"), col("id"))
        .sortWithinPartitions("skey", "id")
      val schema = org.apache.spark.sql.types.StructType(
        ordered.schema.fields :+ org.apache.spark.sql.types.StructField(
          "rnk", org.apache.spark.sql.types.LongType, nullable = false))
      val ranked = spark.createDataFrame(
        ordered.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
        schema)
      val bkt = expr(s"rnk div $w")
      val aSide = ranked.select(col("id").as("id_x"), col("rnk").as("rnk_x"),
        col("shingles").as("sh_x"),
        explode(array(bkt, bkt + lit(1L))).as("bucket"))
      val bSide = ranked.select(col("id").as("id_y"), col("rnk").as("rnk_y"),
        col("shingles").as("sh_y"), bkt.as("bucket"))
      aSide.join(bSide, "bucket")
        .filter(col("rnk_y") - col("rnk_x") >= 1L &&
          col("rnk_y") - col("rnk_x") <= lit(w - 1))
        .withColumn("inter", size(array_intersect(col("sh_x"), col("sh_y"))).cast("double"))
        .withColumn("uni", size(array_union(col("sh_x"), col("sh_y"))).cast("double"))
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"),
          (col("inter") / col("uni")).as("jaccard"))
    }
    // Each pass's rank assignment (RDD zipWithIndex) launches an eager
    // partition-count job at CONSTRUCTION; the passes are independent,
    // so build them concurrently (guide §2.6, r15) — the count jobs
    // overlap and each one's range exchange is in flight while the
    // other's tail finishes. The pass chains themselves stay lazy.
    val passes = Graphs.inParallelSeq(keyExprs.map(k => () => passScored(k)))
    val candUnion = passes.reduce(_.unionByName(_))
    // Threshold BEFORE the cross-pass dedup: only surviving pairs
    // reach the one cross-pass shuffle. A pair blocked by k passes
    // scores the IDENTICAL IEEE double in each (same two arrays,
    // same expression — integer set sizes divided), so it survives
    // or dies in every pass alike and the distinct stays
    // deterministic; duplicated scoring work is bounded by the
    // cross-pass duplicate rate (0.2% of candidates at the x100
    // profile point) — noise against the join traffic it replaces.
    // The distinct runs even for a single pass (whose pairs are
    // already unique): a keys-only aggregate over the tiny surviving
    // set costs nothing and keeps one code path.
    val surviving = candUnion.filter(col("jaccard") >= threshold)
    val verified = surviving.distinct()
    (candUnion, surviving, verified)
  }

  /** Two-pass [[sortedNeighborhoodNearDupsMultiKey]] with the default
    * complementary key pair: hex(prefix of normalized text) and
    * hex(prefix of REVERSED normalized text). See the multi-key
    * scaladoc for why one pass is not enough.
    */
  def sortedNeighborhoodMultiPass(
      df: DataFrame, textCol: String, idCol: String,
      window: Int = 10, keyLen: Int = 24, shingleSize: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    require(keyLen >= 1, s"keyLen=$keyLen must be >= 1")
    val norm = normalizeText(col(textCol))
    sortedNeighborhoodNearDupsMultiKey(df, textCol, idCol,
      Seq(hex(substring(norm, 1, keyLen)),
        hex(substring(reverse(norm), 1, keyLen))),
      window, shingleSize, threshold)
  }
}
