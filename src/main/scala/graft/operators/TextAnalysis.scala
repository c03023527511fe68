package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.TextFunctions._

/** Whole-table text-analysis transforms over a `documents(text)`
  * table. Thin compositions of [[graft.functions.TextFunctions]] —
  * every derived column is a codegen'd expression, so these run at
  * scan speed and pipeline into downstream filters without a shuffle.
  */
object TextAnalysis {

  /** Token statistics: whitespace tokens, BPE-ish tokens, chars. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(col(textCol)))
      .withColumn("n_chars_computed", length(col(textCol)))

  /** Quality columns: punct ratio, stopword ratio, composite score. */
  def quality(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("punct_ratio", graft.functions.MathFunctions.roundTo(punctRatio(col(textCol)), 6))
      .withColumn("stopword_ratio", graft.functions.MathFunctions.roundTo(stopwordRatio(col(textCol)), 6))
      .withColumn("quality_score", qualityScore(col(textCol)))

  /** Heuristic language ID column. */
  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))

  /** Fingerprints: md5 of normalized text + 64-bit rolling hash. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))
      .withColumn("rolling_hash", rollingHash(col(textCol)))

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1 "repetition
    * filters" family) — the standard quality gate against boilerplate
    * and degenerate generations:
    *
    *  - `top_token_frac`: count of the most frequent token / total
    *    tokens. Computed with an explode + two keyed aggregations —
    *    both shuffles are keyed by (doc, token) / doc, partially
    *    aggregated map-side, so the plan is safe at any corpus size.
    *  - `dup_2gram_frac`: 1 − distinct/total word 2-grams, computed
    *    entirely with array built-ins (no explode, no shuffle).
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.MathFunctions.roundTo
    val toks = split(normalizeText(col(textCol)), " ")
    val nGrams = size(toks) - 1
    val grams = transform(sequence(lit(1), nGrams),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val dupFrac = when(nGrams <= 0, lit(0.0)).otherwise(
      roundTo(lit(1.0) - size(array_distinct(grams)).cast("double") / nGrams.cast("double"), 6))
    val withDup = df.select(col(idCol), col(textCol)).withColumn("dup_2gram_frac", dupFrac)
    val top = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(idCol, "__tok").agg(count("*").as("__n"))
      .groupBy(idCol).agg(
        roundTo(max("__n").cast("double") / sum("__n").cast("double"), 6).as("top_token_frac"))
    withDup.join(top, Seq(idCol)).select(idCol, "top_token_frac", "dup_2gram_frac")
  }

  /** DISTRIBUTED global running sum of `valueCol` in `sortCol` order —
    * the classic two-pass prefix sum, NOT a single-partition window:
    * range-repartition on the sort key, per-partition subtotals
    * (tiny collect: one long per partition), then a per-partition
    * streaming pass that starts from the broadcast prefix offset.
    * For UNIQUE `sortCols` keys the values are identical to
    * `sum().over(Window.orderBy(sortCols))` at any partition count
    * (callers must pass a key set that totally orders rows — with
    * duplicate keys, tie order within a partition is arbitrary AND the
    * window's default RANGE frame would sum peer rows together, so
    * neither formulation is well-defined). Holds at 100 TB because no
    * task ever sees more than its own range slice.
    */
  def runningSum(df: DataFrame, sortCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val valIdx = sorted.schema.fieldIndex(valueCol)
    // BOTH passes run over the SAME compiled RDD: a fresh `.rdd` (or a
    // DataFrame agg) could get a different AQE partition coalescing,
    // which would misalign partition ids with the prefix offsets.
    val rdd = sorted.rdd
    val nParts = rdd.getNumPartitions
    // nulls contribute 0 to the running total, matching sum().over()
    // which skips null frame rows (the row itself still gets the
    // carried total; downstream arithmetic null-propagates as before)
    def valOf(r: Row): Long = if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx)
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(r => s += valOf(r)); Iterator((pid, s))
    }.collect().toMap
    val offsets = new Array[Long](nParts + 1)
    for (p <- 0 until nParts) offsets(p + 1) = offsets(p) + partSums.getOrElse(p, 0L)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r => acc += valOf(r); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Sequence packing for LLM training: assign each document to the
    * token-budget pack in which it STARTS, via the distributed running
    * token count. One range shuffle + two scan passes — no global
    * window.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int = 2048): DataFrame = {
    val withTok = df.withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
    runningSum(withTok, Seq(idCol), "n_tokens", "cum")
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
  }
}
