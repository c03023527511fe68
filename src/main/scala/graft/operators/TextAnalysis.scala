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

  /** Exact chunk-level (sub-document) dedup stats, the "Deduplicating
    * Training Data Makes Language Models Better" (Lee et al. 2022)
    * family: split each document into consecutive non-overlapping
    * `chunkSize`-token chunks and mark every chunk occurrence that is
    * not the GLOBALLY FIRST occurrence of its chunk text (first =
    * lowest doc id, then lowest position within it) as a duplicate.
    * Returns per-doc `(n_chunks, n_dup_chunks, dup_frac)` — the
    * signal a curation pipeline thresholds to drop boilerplate-heavy
    * documents that document-level dedup can't see.
    *
    * Scale shape: deliberately NO window over the chunk key (a hot
    * boilerplate chunk would pile its ~10⁹ occurrences into one
    * window partition). Instead: two keyed aggregations (min doc,
    * then min position within that doc — both map-side combinable,
    * so a hot chunk costs one combiner cell per task) and two
    * equi-joins on the chunk hash, then a per-doc count aggregate.
    * Chunks travel as 60-bit portable hashes, not strings — the
    * shuffle carries 8 bytes per occurrence regardless of chunk text
    * size, and the md5-based hash keeps the whole construction
    * engine-replicable (oracle-checkable) end to end.
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int = 3): DataFrame = {
    require(chunkSize >= 1)
    val toks = split(normalizeText(col(textCol)), " ")
    val nChunks = floor(size(toks) / chunkSize).cast("int")
    // guard: sequence(0, -1) would produce a DESCENDING [0, -1] in
    // Spark, not an empty array — short docs must yield zero chunks
    val idxs = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(lit(Array.emptyIntArray))
    val chunks = transform(idxs,
      i => struct(i.as("pos"),
        graft.operators.Dedup.portableHash60(
          concat_ws(" ", slice(toks, i * chunkSize + lit(1), lit(chunkSize)))).as("h")))
    val occ = df
      .select(col(idCol).as("__id"), explode(chunks).as("__c"))
      .select(col("__id"), col("__c.pos").as("__pos"), col("__c.h").as("__h"))
    val firstDoc = occ.groupBy("__h").agg(min("__id").as("__fd"))
    val firstPos = occ.join(firstDoc, "__h").filter(col("__id") === col("__fd"))
      .groupBy("__h", "__fd").agg(min("__pos").as("__fp"))
    val flagged = occ.join(firstPos, "__h")
      .withColumn("__dup",
        when(col("__id") === col("__fd") && col("__pos") === col("__fp"), 0L).otherwise(1L))
    val perDoc = flagged.groupBy(col("__id").as(idCol)).agg(
      count("*").as("n_chunks"),
      sum("__dup").as("n_dup_chunks"))
    // docs shorter than one chunk have zero occurrences — restore them
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac",
        when(col("n_chunks") === 0, lit(0.0)).otherwise(
          graft.functions.MathFunctions.roundTo(
            col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"), 6)))
  }

  /** C4/Gopher-style document filter flags (Raffel et al. 2020 §2.2;
    * Rae et al. 2021 §A1.1): each heuristic as its own boolean column
    * plus the composite `keep`. Tag-don't-drop, like the pipeline's
    * image filters — downstream picks the policy; the flags are the
    * audit trail.
    *
    * All flags are codegen'd scalar expressions (scan speed, no
    * shuffle): token-count bounds, mean-word-length bounds [3,10],
    * stopword presence, brace/lorem-ipsum content filters, and a
    * symbol-ratio cap.
    */
  def c4Filters(df: DataFrame, idCol: String, textCol: String,
                minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    import graft.functions.MathFunctions.roundTo
    val t = col(textCol)
    val toks = tokens(t)
    val n = size(toks)
    // mean word length over the normalized text: letters-only length /
    // token count (portable: one regexp + arithmetic)
    val meanLen = when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(normalizeText(t), " ", "")).cast("double") / n.cast("double"))
    val lower_t = lower(t)
    df.select(
      col(idCol),
      (n < minTokens).as("flag_too_short"),
      (n > maxTokens).as("flag_too_long"),
      (meanLen < 3.0 || meanLen > 10.0).as("flag_word_length"),
      (stopwordHits(t) === 0).as("flag_no_stopwords"),
      lower_t.contains("{").as("flag_brace"),
      lower_t.contains("lorem ipsum").as("flag_lorem"),
      (punctRatio(t) > 0.3).as("flag_symbol_ratio"),
      roundTo(meanLen, 6).as("mean_word_len"))
      .withColumn("keep",
        !col("flag_too_short") && !col("flag_too_long") && !col("flag_word_length") &&
        !col("flag_no_stopwords") && !col("flag_brace") && !col("flag_lorem") &&
        !col("flag_symbol_ratio"))
  }
}
