package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
}
