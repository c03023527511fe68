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
  /** Python-`zfill` semantics: pad to `width` but NEVER truncate.
    * Spark's `lpad` truncates strings longer than the width, which
    * would silently COLLIDE keys once ids outgrow their digit budget
    * (e.g. shard 149999 truncated to '14999' overwrites shard 14999's
    * files) — the reference's zfill just widens there.
    */
  private def zfill(c: Column, width: Int): Column = {
    val s = c.cast("string")
    when(length(s) >= width, s).otherwise(lpad(s, width, "0"))
  }

  def computeKey(shardId: Column, idxInShard: Column,
                 oomSamplePerShard: Int, oomShardCount: Int): Column = {
    val width = oomSamplePerShard + oomShardCount
    val keyInt = shardId * math.pow(10, oomSamplePerShard).toLong + idxInShard
    zfill(keyInt.cast("string"), width)
  }

  /** Zero-padded shard file stem — reference `writer.py:70-72`. */
  def shardName(shardId: Column, oomShardCount: Int = 5): Column =
    zfill(shardId.cast("string"), oomShardCount)

  /** Fixed-size contiguous sharding — reference `reader.py:137-150`:
    * given a 0-based global row index, the shard id is idx / n. */
  def shardId(globalIdx: Column, samplesPerShard: Int): Column =
    floor(globalIdx / samplesPerShard).cast("long")
}
