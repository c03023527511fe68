package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression ports of the reference pipeline's scalar helpers
  * (rom1504/img2dataset). Pure `Column` arithmetic — no UDFs — so key
  * synthesis and shard naming cost nothing at scale.
  */
object PipelineFunctions {

  /** Sample key synthesis — reference `downloader.py:88-94`:
    * `key = zeropad(10^oomSample * shard_id + idx_in_shard)` padded to
    * `oomSample + oomShard` digits. Lexicographic key order ==
    * (shard, idx) order, which is what makes re-sharding by key range
    * safe downstream.
    */
  def computeKey(shardId: Column, idxInShard: Column,
                 oomSamplePerShard: Int, oomShardCount: Int): Column = {
    val width = oomSamplePerShard + oomShardCount
    val keyInt = shardId * math.pow(10, oomSamplePerShard).toLong + idxInShard
    lpad(keyInt.cast("string"), width, "0")
  }

  /** Zero-padded shard file stem — reference `writer.py:70-72`. */
  def shardName(shardId: Column, oomShardCount: Int = 5): Column =
    lpad(shardId.cast("string"), oomShardCount, "0")

  /** Fixed-size contiguous sharding — reference `reader.py:137-150`:
    * given a 0-based global row index, the shard id is idx / n. */
  def shardId(globalIdx: Column, samplesPerShard: Int): Column =
    floor(globalIdx / samplesPerShard).cast("long")
}
