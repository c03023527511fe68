package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large⨝large equi-joins on hot keys.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one side must be pre-partitioned or
  * AQE is unavailable (e.g. inside a streaming micro-batch). The salt
  * is derived deterministically from a disambiguating column (NOT
  * `rand()` — retries/speculation must produce identical rows).
  *
  * Shape: the skewed (probe) side gets `salt = xxhash64(saltBy) mod S`;
  * the build side is replicated S× with each salt value; the join key
  * becomes (key, salt), splitting each hot key's rows across S
  * reducers.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltBy: String, saltFactor: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Replicating the build side makes right/full-outer unsound: an
    // unmatched build row would surface once per salt value.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-flavored joins only, got $joinType")
    val l = skewed.withColumn("_salt", pmod(xxhash64(col(saltBy)), lit(saltFactor.toLong)))
    val r = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
