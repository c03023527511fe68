package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the operator surface. */
object MathFunctions {

  /** Deterministic cross-engine rounding: `floor(x·10^d + 0.5)/10^d`.
    *
    * Spark's `round()` on doubles goes through the value's shortest
    * decimal representation (`BigDecimal.valueOf`) and HALF_UPs that,
    * so a double infinitesimally below `x.xxxxx5` whose shortest repr
    * IS `x.xxxxx5` rounds up — while engines that round the actual
    * binary value (DuckDB, C) round down. This explicit form uses only
    * IEEE ops (mul, add, floor, div), so any engine computes the same
    * bits. Used on every aggregated double the oracle compares.
    */
  def roundTo(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  /** DuckDB-side mirror of [[roundTo]] for oracle SQL generation. */
  def roundToSql(e: String, digits: Int): String =
    s"floor(($e) * 1e$digits + 0.5) / 1e$digits"
}
