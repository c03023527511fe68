package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Observation

/** Bridge into `private[sql]` Observation API: `getOrEmpty` waits a
  * bounded time and returns empty if the observed write never emitted
  * metrics (zero-task incremental runs) — unlike `get`, which would
  * park a thread forever.
  */
object ObservationBridge {
  def getOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
