package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Stat-resetting eager local checkpoint for iterative algorithms.
  *
  * `Dataset.localCheckpoint` truncates the LOGICAL plan but
  * deliberately carries the origin plan's `Statistics` onto the
  * replacement `LogicalRDD`. For a loop whose round-k frame joins the
  * round-(k−1) checkpoint twice (rank delta probes, label
  * propagation, pointer doubling), the default size-only estimator
  * multiplies child sizes, so the carried `sizeInBytes` SQUARES (or
  * worse) every round: the BigInt doubles in bit-length per
  * iteration, plan-stats arithmetic starts dominating wall time
  * (~3×/round growth measured on a 3-node graph by round 20), and at
  * ~2^31 bits `BigInteger` throws `would overflow supported range`.
  *
  * This helper materializes the frame with a plain eager
  * `localCheckpoint`, then rebuilds a DataFrame over the SAME
  * checkpointed `InternalRow` RDD (zero copy, zero re-encode) via
  * `internalCreateDataFrame` — whose `LogicalRDD` carries NO origin
  * stats, so every round restarts from the default size estimate.
  * The conservative default also keeps the optimizer from ever
  * broadcasting the data-sized iteration frame.
  *
  * Lives under `org.apache.spark.sql` solely to reach the
  * `private[sql]` `internalCreateDataFrame`.
  */
object CheckpointBridge {
  def localCheckpointFreshStats(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val classic = ck.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(ck.queryExecution.toRdd, ck.schema)
  }
}
