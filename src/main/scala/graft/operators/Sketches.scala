package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MathFunctions.roundTo

/** Distributed approximate sketches for 100 TB-scale profiling:
  * HyperLogLog distinct counting and Count-Min-Sketch heavy hitters.
  *
  * Both are built from PORTABLE primitives (the 60-bit md5 hash of
  * [[Dedup.portableHash60]], integer shifts, exact-power-of-two
  * arithmetic) so another engine can replicate the sketch BIT-EXACTLY
  * — which is how the DuckDB oracle verifies them as full
  * hash-matches rather than "approximately close" checks.
  *
  * Scale shape: each sketch is one map-side-combinable keyed
  * aggregation over the raw stream (bucket cardinality is a constant
  * `m` / `d·w`, independent of input size), so the shuffle is O(groups
  * × sketch size) regardless of row count — the property that makes
  * sketches the right tool when exact distinct/frequency state would
  * not fit anywhere.
  */
object Sketches {

  /** Number of leading-zero-adjusted rank bits: position of the first
    * set bit (from the MSB of a `width`-bit value) + 1; `width + 1`
    * for value 0. Computed as `width - bitlength(v) + 1` with
    * `bitlength = length(bin(v))` — Spark and DuckDB `bin()` both
    * print the minimal binary form, making the expression portable.
    */
  private def rho(v: Column, width: Int): Column =
    when(v === 0L, lit(width + 1))
      .otherwise(lit(width) - length(bin(v)) + 1)

  /** HyperLogLog distinct estimate of `valueCol` per `groupCols`
    * (empty seq → one global row).
    *
    * Portable-determinism design:
    *  - register = low `p` bits of the 60-bit md5 hash; rank from the
    *    remaining `60-p` bits. Both pure integer ops.
    *  - the harmonic sum Σ 2^-M_j is computed in INTEGER arithmetic as
    *    `z_int = Σ 2^(S-M_j)` (S = 50 ≥ max rank 49 at p=12, so every
    *    term is an exact BIGINT; m·2^S ≤ 2^62 — no ANSI overflow).
    *    A double-precision Σ would be addition-order-dependent across
    *    engines; the integer form is exact, so the single final
    *    division `α·m²·2^S / z_int` is IEEE-deterministic everywhere.
    *  - raw HLL estimate only (no small/large-range corrections: they
    *    need `ln`, whose last-ulp behavior is libm-specific — the raw
    *    estimate keeps the oracle bit-exact; callers needing the
    *    corrected estimate at tiny cardinalities should use exact
    *    count_distinct, which is cheap exactly there).
    *
    * Returns `groupCols :+ (n_exact, hll_estimate)` — the exact count
    * rides along for error accounting (drop it at true scale).
    */
  def hllDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val m = 1 << p
    val width = 60 - p
    val S = 50
    require(width + 1 <= S, "rank must fit the integer scaling")
    val alpha = 0.7213 / (1.0 + 1.079 / m) // the standard α_m for m ≥ 128
    val h = Dedup.portableHash60(col(valueCol).cast("string"))
    val bucket = pmod(h, lit(m.toLong))
    // high bits via INTEGER shift — h/m through `/` would round-trip a
    // 60-bit value through double and lose everything below 2^52
    val rank = rho(shiftright(h, p), width)
    val gs = groupCols.map(col)
    // pass 1: max rank per (group, register) — map-side combinable,
    // ≤ m rows per group survive the shuffle no matter the input size
    val regs = df.select((gs :+ bucket.as("__b") :+ rank.as("__r")): _*)
      .groupBy((gs :+ col("__b")): _*).agg(max("__r").as("__m"))
    // pass 2: integer harmonic fold; empty registers contribute 2^S each
    val zNonEmpty = sum(shiftleft(lit(1L), (lit(S) - col("__m")).cast("int")))
    val grouped =
      if (groupCols.isEmpty) regs.agg(zNonEmpty.as("__z"), count("*").as("__n"))
      else regs.groupBy(gs: _*).agg(zNonEmpty.as("__z"), count("*").as("__n"))
    val zInt = col("__z") + (lit(m.toLong) - col("__n")) * lit(1L << S)
    val est = lit(alpha * m * m) * lit(math.pow(2.0, S)) / zInt.cast("double")
    val exact =
      if (groupCols.isEmpty) df.agg(countDistinct(col(valueCol)).as("n_exact"))
      else df.groupBy(gs: _*).agg(countDistinct(col(valueCol)).as("n_exact"))
    val estDf = grouped.select((gs :+ roundTo(est, 3).as("hll_estimate")): _*)
    if (groupCols.isEmpty) exact.crossJoin(estDf)
    else exact.join(estDf, groupCols)
  }

  /** Count-Min-Sketch heavy hitters over exploded `itemCol` values:
    * estimated frequency = min over `d` hash rows of the hashed
    * bucket's total count. Returns the top `k` items by estimated
    * count (ties → item asc) with the exact count alongside.
    *
    * The sketch itself is one groupBy over (row, bucket) — `d·w` cells
    * regardless of input size — and the per-item estimate joins the
    * item's `d` cells against that constant-size table (broadcast: the
    * sketch is KB-sized by construction). Estimates are
    * over-approximations (collisions only ever ADD), the CMS
    * guarantee; with the portable hash the whole construction is
    * engine-reproducible, collisions included.
    */
  def cmsTopK(items: DataFrame, itemCol: String,
              d: Int = 4, w: Int = 1024, k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 2)
    val stream = items.select(col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull)
    def bucketOf(item: Column, row: Int): Column =
      pmod(Dedup.portableHash60(concat(lit(s"cms$row:"), item)), lit(w.toLong))
    // d replicated streams → one keyed count; d·w cells total
    val cells = stream
      .select(explode(array((0 until d).map { r =>
        struct(lit(r).as("__row"), bucketOf(col("__item"), r).as("__b"))
      }: _*)).as("__c"))
      .select(col("__c.__row").as("__row"), col("__c.__b").as("__b"))
      .groupBy("__row", "__b").agg(count("*").as("__cell_n"))
    val exact = stream.groupBy("__item").agg(count("*").as("exact_count"))
    // each distinct item probes its d cells; the cell table is tiny →
    // broadcast, so this adds no extra shuffle of the item set
    val probes = exact.select(col("__item"), col("exact_count"),
        explode(array((0 until d).map { r =>
          struct(lit(r).as("__row"), bucketOf(col("__item"), r).as("__b"))
        }: _*)).as("__c"))
      .select(col("__item"), col("exact_count"),
        col("__c.__row").as("__row"), col("__c.__b").as("__b"))
    probes.join(broadcast(cells), Seq("__row", "__b"))
      .groupBy("__item", "exact_count").agg(min("__cell_n").as("cms_estimate"))
      .orderBy(col("cms_estimate").desc, col("__item").asc)
      .limit(k)
      .select(col("__item").as("item"), col("cms_estimate"), col("exact_count"))
  }
}
