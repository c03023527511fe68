package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream table:
  * watermarked windowed aggregation and stateful sessionization —
  * the engine's stream-processing surface beyond the stats stream.
  *
  * Scale notes: the windowed aggregate is incremental state keyed by
  * (window, event_type) with the watermark bounding state size; the
  * sessionizer keeps one small state object per active user and
  * emits+expires on gap timeout, so state is O(active users), not
  * O(events).
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Int, sum_value: Double)

  /** Streaming read of an events parquet directory, normalizing the
    * `ts` column's two shipped physical forms (TIMESTAMP(NANOS) read
    * as a raw long via the legacy conf; TIMESTAMP(MICROS) read as
    * TIMESTAMP_NTZ, interpreted as UTC wall clock) to one
    * TimestampType `tstamp` column, matching the batch path.
    *
    * `schema`: pass it explicitly to start the stream on a
    * NOT-YET-POPULATED ingest directory (the default infers via a
    * batch read, which needs at least one file). Note the
    * `nanosAsLong` conf is session-level by necessity — the streaming
    * source reads nanos-timestamp files throughout the query's
    * lifetime, so it cannot be set-and-restored around inference.
    */
  def readEvents(spark: SparkSession, dir: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = schema.getOrElse(spark.read.parquet(dir).schema)
    val base = spark.readStream.schema(s).parquet(dir)
    s("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        base.withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType =>
        base.withColumn("tstamp", col("ts"))
      case _ => // TIMESTAMP_NTZ: wall clock interpreted in the session tz
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base.withColumn("tstamp", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark —
    * late data beyond 10 minutes is dropped and state is purged.
    */
  def windowedCounts(events: DataFrame,
                     window_ : String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tstamp", watermark)
      .groupBy(window(col("tstamp"), window_), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("sum_value"))

  /** Streaming exact dedup for a document ingest stream: the first
    * arrival of each content fingerprint passes; duplicates within the
    * watermark horizon are dropped and fingerprint state is PURGED
    * past it (`dropDuplicatesWithinWatermark`), so state is O(docs per
    * horizon), not O(corpus) — the property that makes streaming dedup
    * viable on an unbounded 100 TB ingest (a plain `dropDuplicates`
    * would grow state forever).
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream–static enrichment: join the event stream against a static
    * dimension frame on `key`. The static side is BROADCAST: every
    * micro-batch joins map-side with zero stream-side shuffle, and
    * stream–static joins are STATELESS by construction (nothing is
    * buffered across batches — only stream–stream joins keep state),
    * so this holds on an unbounded ingest regardless of run length.
    * Left join: events without a dimension row pass through with
    * NULLs, they are never dropped by enrichment.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Gap-based sessionization with explicit state: events of a user
    * belong to one session while gaps stay under `gapMillis`; a
    * session is emitted when a larger gap closes it. The trailing
    * (still-open) session per user stays in state awaiting more data —
    * add a GroupStateTimeout flush if end-of-stream emission is
    * needed. `flatMapGroupsWithState` in Append mode.
    */
  case class WindowDistinct(window_start: java.sql.Timestamp, hll_estimate: Double)

  /** Streaming distinct-count per tumbling window via HyperLogLog
    * registers held in keyed state: O(2^p) bytes per OPEN window
    * instead of the O(distinct-values) state an exact streaming
    * count-distinct would need — the property that makes per-window
    * cardinality viable on an unbounded 100 TB ingest (unique users,
    * unique URLs, unique document fingerprints per hour).
    *
    * Same portable hash / register / integer-harmonic arithmetic as
    * [[graft.operators.Sketches.hllDistinct]], so a CLOSED window's
    * estimate is bit-identical to running the batch sketch over the
    * same rows (asserted in EventStreamSpec). Each window's final
    * estimate is emitted once, when the watermark passes its end
    * (`EventTimeTimeout`, Append mode), and its state is purged.
    */
  def hllDistinctStream(events: DataFrame, tsCol: String, valueCol: String,
                        windowMillis: Long,
                        watermark: String = "10 minutes",
                        p: Int = 11): Dataset[WindowDistinct] = {
    require(p >= 11 && p <= 12, s"p=$p outside [11,12]")
    val spark = events.sparkSession
    import spark.implicits._
    val m = 1 << p
    val width = 60 - p
    val S = graft.operators.Sketches.HllShift
    val alpha = graft.operators.Sketches.hllConstant(p)
    // the watermarked event-time column must survive projection into
    // the grouped Dataset UNALIASED (a cast or alias strips the
    // watermark tag and event-time timeout then fails analysis)
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
              window(col(tsCol), s"$windowMillis milliseconds")
                .getField("start").as("wstart"),
              col(valueCol).cast("string").as("v"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getTimestamp(1))
      .flatMapGroupsWithState[Array[Byte], WindowDistinct](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart, rows, state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) {
            val regs = state.get
            state.remove()
            var zInt = 0L
            var b = 0
            while (b < m) {
              zInt += (1L << (S - regs(b))) // empty register: rank 0 -> 2^S
              b += 1
            }
            val est = alpha / zInt.toDouble
            Iterator.single(WindowDistinct(wstart, math.floor(est * 1e3 + 0.5) / 1e3))
          } else {
            val regs = state.getOption.getOrElse(new Array[Byte](m))
            // skip NULL values (COUNT(DISTINCT) semantics, matching the
            // batch hllRegisters filter) — fromString(null) would NPE
            // inside md5Hash60 and kill the streaming query
            rows.foreach { r => if (!r.isNullAt(2)) {
              val h = graft.plans.TextExprs.md5Hash60(
                org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2)))
              val bucket = (h % m).toInt // h is 60-bit, non-negative
              val hi = h >>> p
              val rank =
                if (hi == 0L) width + 1
                else width - (64 - java.lang.Long.numberOfLeadingZeros(hi)) + 1
              if (rank > regs(bucket)) regs(bucket) = rank.toByte
            }}
            state.update(regs)
            // fire once the watermark passes the window end; clamp
            // above the current watermark (a timeout in the past is
            // rejected by the state store)
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMillis,
                       state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class WindowDomainQuality(window_start: java.sql.Timestamp, source: String,
                                 n_docs: Long, short_frac: Double,
                                 distinct_est: Double, dup_frac_est: Double)

  /** Live twin of [[graft.operators.TextAnalysis.domainQuality]]: a
    * per-(window, source) crawl-quality monitor over a document ingest
    * stream. Per open key the state is ONE (count, shortCount,
    * HLL-register array) triple — O(2^p) bytes regardless of how many
    * pages a domain pours in — so a domain that floods the crawler is
    * exactly the case the monitor stays cheap for. Exact distinct
    * fingerprints would need unbounded state; the HLL estimate (same
    * portable registers as [[hllDistinctStream]] / the batch sketch)
    * bounds it, making `dup_frac_est` an ESTIMATE — the batch operator
    * owns the exact number, the stream owns the early warning
    * (documented trade, same standing as funnelStream's late-touch
    * caveat). Unlike the oracle-checked batch sketch (raw estimator
    * only, the engine-portable contract), this monitor applies the
    * STANDARD small-range correction (linear counting over empty
    * registers, Flajolet et al. 2007 §4) below the 2.5·m threshold —
    * without it a 40-copy flood of ONE page reads ~1475 distinct and
    * the dup alarm never fires; with it, ~1.0. Windows emit once when
    * the watermark passes their end and state is purged
    * (EventTimeTimeout, Append mode).
    */
  def domainQualityStream(docs: DataFrame, tsCol: String, sourceCol: String,
                          textCol: String, windowMillis: Long,
                          watermark: String = "10 minutes",
                          minTokens: Int = 20,
                          p: Int = 11): Dataset[WindowDomainQuality] = {
    require(p >= 11 && p <= 12, s"p=$p outside [11,12]")
    val spark = docs.sparkSession
    import spark.implicits._
    val m = 1 << p
    val width = 60 - p
    val S = graft.operators.Sketches.HllShift
    val alpha = graft.operators.Sketches.hllConstant(p)
    val keyed = docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        window(col(tsCol), s"$windowMillis milliseconds")
          .getField("start").as("wstart"),
        col(sourceCol).cast("string").as("src"),
        graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"),
        (graft.functions.TextFunctions.tokenCount(col(textCol)) < minTokens)
          .as("is_short"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => (r.getTimestamp(1), r.getString(2)))
      .flatMapGroupsWithState[(Long, Long, Array[Byte]), WindowDomainQuality](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[(Long, Long, Array[Byte])]) =>
          val (wstart, src) = key
          if (state.hasTimedOut) {
            val (n, nShort, regs) = state.get
            state.remove()
            var zInt = 0L
            var empty = 0
            var b = 0
            while (b < m) {
              zInt += (1L << (S - regs(b)))
              if (regs(b) == 0) empty += 1
              b += 1
            }
            val raw = alpha / zInt.toDouble
            val corrected =
              if (raw <= 2.5 * m && empty > 0) m * math.log(m.toDouble / empty)
              else raw
            val est = math.floor(corrected * 1e3 + 0.5) / 1e3
            val shortFrac = math.floor(nShort.toDouble / n.toDouble * 1e6 + 0.5) / 1e6
            val dupEst = math.max(0.0,
              math.floor((1.0 - est / n.toDouble) * 1e6 + 0.5) / 1e6)
            Iterator.single(WindowDomainQuality(wstart, src, n, shortFrac, est, dupEst))
          } else {
            var (n, nShort, regs) = state.getOption.getOrElse((0L, 0L, new Array[Byte](m)))
            rows.foreach { r =>
              n += 1
              if (!r.isNullAt(4) && r.getBoolean(4)) nShort += 1
              if (!r.isNullAt(3)) {
                val h = graft.plans.TextExprs.md5Hash60(
                  org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(3)))
                val bucket = (h % m).toInt
                val hi = h >>> p
                val rank =
                  if (hi == 0L) width + 1
                  else width - (64 - java.lang.Long.numberOfLeadingZeros(hi)) + 1
                if (rank > regs(bucket)) regs(bucket) = rank.toByte
              }
            }
            state.update((n, nShort, regs))
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMillis,
                       state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class WindowDrift(window_start: java.sql.Timestamp, n: Long,
                         psi: Double, worst_cell: Int, worst_term: Double)

  /** Live twin of [[graft.operators.Similarity.embeddingDrift]]: a
    * per-window embedding-distribution monitor over a vector ingest
    * stream — the serve-side half of the lambda pattern. The batch job
    * owns the reference: it derives the seeded centroids and the
    * reference cell histogram from the accepted corpus, and passes
    * BOTH here as plan constants; the stream assigns each arriving
    * vector to its cell with the same fixed-order
    * [[graft.plans.NearestCentroid]] fold (scan-side, codegen'd —
    * the vector never enters keyed state) and holds ONE
    * `nCells`-long histogram per open window. When the watermark
    * closes a window it emits the +1-smoothed PSI against the
    * reference — bit-identical arithmetic to the batch operator
    * (same IEEE op order, same 1e-6 term quantization, same floor
    * rounding), asserted in EventStreamSpec — plus the worst cell
    * and its signed term for triage. State is O(nCells) longs per
    * open window regardless of stream volume; windows purge on emit
    * (EventTimeTimeout, Append mode).
    */
  def driftStream(vecs: DataFrame, tsCol: String, vecCol: String,
                  centroids: Seq[Seq[Double]], refCounts: Seq[Long],
                  windowMillis: Long,
                  watermark: String = "10 minutes"): Dataset[WindowDrift] = {
    require(centroids.nonEmpty && centroids.size == refCounts.size,
      s"need one reference count per centroid, got ${centroids.size} centroids / " +
        s"${refCounts.size} counts")
    val spark = vecs.sparkSession
    import spark.implicits._
    val k = centroids.size
    val totRef = refCounts.sum
    val keyed = vecs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        window(col(tsCol), s"$windowMillis milliseconds")
          .getField("start").as("wstart"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.plans.NearestCentroid(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(
              transform(col(vecCol).cast("array<double>"),
                x => floor(x * lit(1e6) + lit(0.5)).cast("long")).cast("array<double>")),
            centroids)).as("cell"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getTimestamp(1))
      .flatMapGroupsWithState[Array[Long], WindowDrift](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val hist = state.get
            state.remove()
            val n = hist.sum
            var sumQ = 0L
            var worstCell = 0
            var worstQ = 0L
            var c = 0
            while (c < k) {
              // EXACTLY the batch term: pA over the reference, pB over
              // this window, +1 smoothing, 1e-6 floor quantization
              val pA = (refCounts(c) + 1L).toDouble / (totRef + k).toDouble
              val pB = (hist(c) + 1L).toDouble / (n + k).toDouble
              val tq = math.floor((pA - pB) * math.log(pA / pB) * 1e6 + 0.5).toLong
              sumQ += tq
              if (math.abs(tq) > math.abs(worstQ)) { worstQ = tq; worstCell = c }
              c += 1
            }
            def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
            Iterator.single(WindowDrift(wstart, n,
              q6(sumQ.toDouble / 1e6), worstCell, q6(worstQ.toDouble / 1e6)))
          } else {
            val hist = state.getOption.getOrElse(new Array[Long](k))
            rows.foreach { r => if (!r.isNullAt(2)) hist(r.getInt(2)) += 1 }
            state.update(hist)
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMillis,
                       state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class WindowQuantile(window_start: java.sql.Timestamp,
                            quantile: Double, estimate: Double, n: Long)

  /** Streaming quantiles per tumbling window via histogram-sketch
    * bins held in keyed state: O(numBuckets) longs per OPEN window
    * instead of the O(values) buffer an exact streaming percentile
    * would need — the distribution-shaped sibling of
    * [[hllDistinctStream]] (per-window latency/price/score
    * percentiles on an unbounded ingest).
    *
    * Same bin assignment and interpolation arithmetic as
    * [[graft.operators.Sketches.quantileSketch]] (identical IEEE
    * operation order, identical floor-form rounding), so a CLOSED
    * window's estimates are bit-identical to running the batch
    * sketch over the same rows — asserted in EventStreamSpec. Each
    * window emits once when the watermark passes its end and its
    * state is purged.
    */
  def quantileStream(events: DataFrame, tsCol: String, valueCol: String,
                     windowMillis: Long, lo: Double, hi: Double,
                     numBuckets: Int = 256,
                     quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
                     watermark: String = "10 minutes"): Dataset[WindowQuantile] = {
    require(numBuckets >= 2 && numBuckets <= (1 << 20), s"bad numBuckets $numBuckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val spark = events.sparkSession
    import spark.implicits._
    val qs = quantiles.toArray
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
              window(col(tsCol), s"$windowMillis milliseconds")
                .getField("start").as("wstart"),
              col(valueCol).cast("double").as("v"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getTimestamp(1))
      .flatMapGroupsWithState[Array[Long], WindowQuantile](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val bins = state.get
            state.remove()
            var n = 0L
            var b = 0
            while (b < numBuckets) { n += bins(b); b += 1 }
            if (n == 0L) Iterator.empty
            else qs.iterator.map { q =>
              // identical arithmetic shape to the batch operator:
              // target = max(ceil(q·n), 1); est = lo + (bin +
              // (target - cumBefore)/cnt) · ((hi - lo)/B)
              val target = math.max(math.ceil(q * n.toDouble).toLong, 1L)
              var bin = 0
              var cum = bins(0)
              while (cum < target) { bin += 1; cum += bins(bin) }
              val cnt = bins(bin)
              val cumBefore = cum - cnt
              val est = lo + (bin.toDouble +
                (target - cumBefore).toDouble / cnt.toDouble) *
                ((hi - lo) / numBuckets)
              WindowQuantile(wstart, q, math.floor(est * 1e6 + 0.5) / 1e6, n)
            }
          } else {
            val bins = state.getOption.getOrElse(new Array[Long](numBuckets))
            // NULLs excluded, matching the batch filter
            rows.foreach { r => if (!r.isNullAt(2)) {
              val v = r.getDouble(2)
              val raw = math.floor((v - lo) / (hi - lo) * numBuckets).toLong
              val bin = math.min(math.max(raw, 0L), numBuckets - 1L).toInt
              bins(bin) += 1L
            }}
            state.update(bins)
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMillis,
                       state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class WindowHeavyHitter(window_start: java.sql.Timestamp, rank: Int,
                               item: String, cms_estimate: Long, exact_count: Long)

  /** CMS state per open window: the d×w cell counts plus the bounded
    * candidate map (item → arrivals since admission).
    */
  case class CmsState(cells: Array[Long], items: Map[String, Long])

  /** Streaming heavy hitters per tumbling window: Count-Min cells +
    * a bounded candidate set in keyed state — the frequency-shaped
    * sibling of [[hllDistinctStream]]/[[quantileStream]], completing
    * the batch/streaming sketch symmetry (hot URLs / hot query terms
    * on an unbounded ingest with O(d·w + maxCandidates) state per
    * OPEN window, never O(distinct items)).
    *
    * Parity contract with [[graft.operators.Sketches.cmsTopK]]: the
    * cells use the same portable hash and the same integer counts, and
    * every candidate's final estimate is recomputed from the FINAL
    * cells at window close — so for windows where `maxCandidates` was
    * never exceeded, the emitted top-k (membership, estimates, exact
    * counts, (estimate desc, item asc) order) is bit-identical to the
    * batch sketch over the same rows (asserted in EventStreamSpec).
    * When the candidate set overflows, the smallest-count candidate is
    * evicted first (space-saving style, deterministic (count asc, item
    * desc) order) and a re-admitted item's count restarts — estimates
    * stay exact CMS over-approximations; only `exact_count` degrades
    * to a lower bound, the standard bounded-memory trade.
    */
  def cmsTopKStream(events: DataFrame, tsCol: String, itemCol: String,
                    windowMillis: Long, d: Int = 4, w: Int = 1024,
                    k: Int = 20, maxCandidates: Int = 4096,
                    watermark: String = "10 minutes"): Dataset[WindowHeavyHitter] = {
    require(d >= 1 && w >= 2, s"bad sketch dims d=$d w=$w")
    require(k >= 1 && maxCandidates >= k, s"need maxCandidates >= k, got $maxCandidates < $k")
    val spark = events.sparkSession
    import spark.implicits._
    def bucket(row: Int, item: String): Int =
      (graft.plans.TextExprs.md5Hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"cms$row:$item")) % w).toInt
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
              window(col(tsCol), s"$windowMillis milliseconds")
                .getField("start").as("wstart"),
              col(itemCol).cast("string").as("v"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getTimestamp(1))
      .flatMapGroupsWithState[CmsState, WindowHeavyHitter](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (wstart, rows, state: GroupState[CmsState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // final estimates from the END-of-window cells — the same
            // numbers the batch sketch computes, collisions included
            val ranked = st.items.toSeq.map { case (item, cnt) =>
              var est = Long.MaxValue
              var r = 0
              while (r < d) {
                val c = st.cells(r * w + bucket(r, item))
                if (c < est) est = c
                r += 1
              }
              (item, est, cnt)
            }.sortBy { case (item, est, _) => (-est, item) }.take(k)
            ranked.iterator.zipWithIndex.map { case ((item, est, cnt), i) =>
              WindowHeavyHitter(wstart, i + 1, item, est, cnt)
            }
          } else {
            val st = state.getOption.getOrElse(
              CmsState(new Array[Long](d * w), Map.empty))
            val cells = st.cells
            var items = st.items
            rows.foreach { r => if (!r.isNullAt(2)) {
              val item = r.getString(2)
              var rI = 0
              while (rI < d) { cells(rI * w + bucket(rI, item)) += 1L; rI += 1 }
              items.get(item) match {
                case Some(c) => items = items.updated(item, c + 1L)
                case None =>
                  if (items.size >= maxCandidates) {
                    // deterministic space-saving eviction: smallest
                    // count first, largest item string on ties
                    val victim = items.reduceLeft { (a, b) =>
                      if (b._2 < a._2 || (b._2 == a._2 && b._1 > a._1)) b else a
                    }
                    items = items - victim._1
                  }
                  items = items.updated(item, 1L)
              }
            }}
            state.update(CmsState(cells, items))
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMillis,
                       state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              // within-gap of the stored interval (EITHER side — a
              // later micro-batch can deliver events older than the
              // stored end): widen with min/max, never move a boundary
              // backward-in-coverage. The old `end = t` regressed the
              // session end on cross-batch out-of-order arrivals,
              // wrongly splitting later events off.
              case Some(s) if t >= s.start - gapMillis && t - s.end <= gapMillis =>
                cur = Some(s.copy(start = math.min(s.start, t), end = math.max(s.end, t),
                                  n = s.n + 1, sum = s.sum + e.value))
              case Some(s) if t > s.end + gapMillis =>
                out += Session(userId, s.start, s.end, s.n, s.sum)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(_) =>
                // older than start - gap: a stale straggler from a
                // session that already closed — emit it as its own
                // singleton rather than corrupting the live session
                out += Session(userId, t, t, 1, e.value)
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => ()
          }
          out.iterator
      }
  }

  /** One user lifecycle transition: new / retained / resurrected on
    * the user's active day, churned on their first inactive day. */
  case class LifecycleEvent(user_id: Long, day: Long, transition: String)

  /** Per-user lifecycle state: last active day + whether the churn
    * row for lastDay + 1 has already been emitted. */
  case class LifecycleState(lastDay: Long, churnEmitted: Boolean)

  /** Streaming growth accounting — the live twin of
    * [[graft.operators.EventAnalytics.lifecycle]]: a per-user
    * transition FEED (this user just came back; that cohort is
    * churning) instead of the batch per-day rollup — sum the feed by
    * (day, transition) and you have the batch counts. Per user:
    * first-ever active day emits `new`; a day adjacent to the last
    * active day emits `retained`; a gap emits `resurrected` (after
    * the gap's `churned` row, emitted inline if the watermark timeout
    * has not fired yet — in-order delivery reproduces the batch
    * classification exactly); an idle user's `churned` row emits when
    * the watermark passes the end of lastDay + 1.
    *
    * Honest contracts: days older than the user's last active day
    * are ignored (the past is not reclassified — same as batch,
    * where only the distinct-day sequence matters), and a day whose
    * END the watermark has already passed is LATE and dropped — its
    * churn verdict may already be emitted, and retroactively
    * contradicting an emitted row is worse than honoring the
    * watermark contract the caller chose. State is ONE (long, bool)
    * per user EVER seen and is deliberately never expired — lifetime
    * semantics need lifetime identity (expiring state would re-emit
    * `new` for a returning veteran), and the batch operator pays the
    * same O(users) cost in its distinct frame. Event volume inside a
    * day never emits twice.
    */
  def lifecycleStream(events: DataFrame, tsCol: String, userCol: String,
                      watermark: String = "1 hour"): Dataset[LifecycleEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayMs = 86400000L
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(userCol).cast("long").as("u"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getLong(1))
      .flatMapGroupsWithState[LifecycleState, LifecycleEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[LifecycleState]) =>
          def armTimeout(s: LifecycleState): Unit =
            if (!s.churnEmitted)
              state.setTimeoutTimestamp(
                math.max((s.lastDay + 2) * dayMs + 1,
                         state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            val s = state.get
            val wm = state.getCurrentWatermarkMs()
            if (!s.churnEmitted && (s.lastDay + 2) * dayMs <= wm) {
              state.update(LifecycleState(s.lastDay, churnEmitted = true))
              // no re-arm: nothing further can happen without activity
              Iterator.single(LifecycleEvent(user, s.lastDay + 1, "churned"))
            } else { armTimeout(s); Iterator.empty }
          } else {
            val wm = state.getCurrentWatermarkMs()
            val days = rows.map(r =>
                Math.floorDiv(r.getTimestamp(0).getTime, dayMs))
              .filter(d => (d + 1) * dayMs > wm) // late day: already closed
              .toSeq.distinct.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[LifecycleEvent]
            var s = state.getOption.orNull
            days.foreach { d =>
              if (s == null) {
                out += LifecycleEvent(user, d, "new")
                s = LifecycleState(d, churnEmitted = false)
              } else if (d == s.lastDay + 1) {
                out += LifecycleEvent(user, d, "retained")
                s = LifecycleState(d, churnEmitted = false)
              } else if (d > s.lastDay + 1) {
                if (!s.churnEmitted)
                  out += LifecycleEvent(user, s.lastDay + 1, "churned")
                out += LifecycleEvent(user, d, "resurrected")
                s = LifecycleState(d, churnEmitted = false)
              } // d <= lastDay: same-day volume or an old day — no-op
            }
            if (s != null) { state.update(s); armTimeout(s) }
            out.iterator
          }
      }
  }

  /** One bot verdict crossing: emitted AT MOST ONCE per (user,
    * verdict) the moment the rule becomes true. */
  case class BotFlag(user_id: Long, verdict: String, minute: Long,
                     n_events: Long, active_minutes: Long, max_per_minute: Long)

  /** Per-user monitor state: still-open minute counts + three
    * watermark-final scalars + the two once-only emission latches. */
  case class BotState(open: Map[Long, Long], maxClosed: Long,
                      totalClosed: Long, activeClosed: Long,
                      burstFlagged: Boolean, sustainedFlagged: Boolean)

  /** Streaming rate-based bot detection — the live twin of
    * [[graft.operators.EventAnalytics.botDetect]]: per user, count
    * events into event-time minute buckets; emit a `burst` flag the
    * INSTANT any single minute's count reaches `burstPerMinute`
    * (within-minute counts only grow, so the crossing is monotone and
    * safe to emit early), and a `sustained` flag when the
    * watermark-CLOSED history first satisfies both
    * `total ≥ minEvents` and `total ≥ activeMinutes ·
    * sustainedPerMinute` (exact integer compares, same rule as
    * batch). Each verdict fires at most once per user — this is a
    * pager, not a ledger; the batch operator owns the full roster.
    *
    * Semantics note (the honest divergence from batch): `burst`
    * reports the LIVE totals at crossing time (that is the point of a
    * live monitor); `sustained` is evaluated only over minutes the
    * watermark has closed, so its numbers are final and replay
    * identically. A flood arriving entirely inside one not-yet-closed
    * minute still pages — via the burst rule — immediately.
    *
    * State per user is O(open minutes + 5) longs — bounded by the
    * watermark horizon, never by event volume (a 10⁶-event minute is
    * ONE map entry).
    */
  def botStream(events: DataFrame, tsCol: String, userCol: String,
                burstPerMinute: Int = 30, sustainedPerMinute: Int = 2,
                minEvents: Int = 50,
                watermark: String = "10 minutes"): Dataset[BotFlag] = {
    require(burstPerMinute >= 1 && sustainedPerMinute >= 1 && minEvents >= 1,
      s"thresholds must be >= 1: $burstPerMinute/$sustainedPerMinute/$minEvents")
    val spark = events.sparkSession
    import spark.implicits._
    val minMs = 60000L
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(userCol).cast("long").as("u"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getLong(1))
      .flatMapGroupsWithState[BotState, BotFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[BotState]) =>
          def armTimeout(open: Map[Long, Long]): Unit =
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                math.max((open.keys.min + 1) * minMs + 1,
                         state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            val s = state.get
            val wm = state.getCurrentWatermarkMs()
            val (closable, stillOpen) = s.open.partition { case (m, _) => (m + 1) * minMs <= wm }
            val total = s.totalClosed + closable.valuesIterator.sum
            val active = s.activeClosed + closable.size
            val mx = (s.maxClosed +: closable.values.toSeq).max
            val out =
              if (closable.nonEmpty && !s.sustainedFlagged &&
                  total >= minEvents.toLong &&
                  total >= active * sustainedPerMinute.toLong)
                Seq(BotFlag(user, "sustained", closable.keys.max, total, active, mx))
              else Seq.empty
            state.update(BotState(stillOpen, mx, total, active,
              s.burstFlagged, s.sustainedFlagged || out.nonEmpty))
            armTimeout(stillOpen)
            out.iterator
          } else {
            val s = state.getOption.getOrElse(
              BotState(Map.empty, 0L, 0L, 0L, burstFlagged = false, sustainedFlagged = false))
            var open = s.open
            var burstEmit: Option[BotFlag] = None
            rows.foreach { r =>
              val m = Math.floorDiv(r.getTimestamp(0).getTime, minMs)
              val c = open.getOrElse(m, 0L) + 1L
              open = open.updated(m, c)
              if (!s.burstFlagged && burstEmit.isEmpty && c >= burstPerMinute.toLong) {
                val liveTotal = s.totalClosed + open.valuesIterator.sum
                val liveActive = s.activeClosed + open.size.toLong
                burstEmit = Some(BotFlag(user, "burst", m, liveTotal, liveActive, c))
              }
            }
            state.update(BotState(open, s.maxClosed, s.totalClosed, s.activeClosed,
              s.burstFlagged || burstEmit.nonEmpty, s.sustainedFlagged))
            armTimeout(open)
            burstEmit.iterator
          }
      }
  }

  /** One closed (event_type, day) volume with its prequential
    * z-score: NULL z until the type has >= 2 closed trailing days
    * with nonzero variance. */
  case class DayVolume(event_type: String, day: Long, n_events: Long,
                       z: Option[Double], is_anomaly: Option[Boolean])

  /** Per-type monitor state: counts of still-open days + the trailing
    * closed (day, count) history the z-score baselines against. */
  case class AnomalyState(open: Map[Long, Long], closed: Seq[(Long, Long)])

  /** Streaming volume-anomaly monitor — the live twin of
    * [[graft.operators.EventAnalytics.dailyAnomalies]]: per event
    * type, count events per event-time day; when the watermark closes
    * a day, z-score its count against the type's TRAILING `history`
    * closed days and emit (Append mode) with `is_anomaly = |z| >=
    * zThreshold`.
    *
    * Semantics note (the honest divergence from batch): the batch
    * operator scores every day against the type's FULL day history —
    * a retrospective sweep. A stream can only know the past, so this
    * is the PREQUENTIAL form: each day scores against the trailing
    * window of days closed BEFORE it, which is also what a live
    * monitor wants (yesterday's incident must not inflate today's
    * baseline forever — the rolling window ages it out). The first
    * two closed days of a type emit NULL z (no baseline), exactly as
    * batch does for single-day types.
    *
    * State per event type is O(open days + history) longs — bounded
    * by the watermark (open days) and the `history` cap, never by
    * event volume. Arithmetic: day indices are floor-divided epoch
    * millis; counts are exact longs; moments fold in BigInt (a
    * 100 TB ingest's per-day counts square past 2^63) and the z is
    * ONE fixed-shape IEEE expression quantized at 1e-6 — the same
    * shape as batch.
    */
  def anomalyStream(events: DataFrame, tsCol: String, typeCol: String,
                    zThreshold: Double = 2.0, history: Int = 28,
                    watermark: String = "1 hour"): Dataset[DayVolume] = {
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    require(history >= 2, s"history must be >= 2, got $history")
    val spark = events.sparkSession
    import spark.implicits._
    val dayMs = 86400000L
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(typeCol).cast("string").as("et"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getString(1))
      .flatMapGroupsWithState[AnomalyState, DayVolume](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (eventType, rows, state: GroupState[AnomalyState]) =>
          def armTimeout(open: Map[Long, Long]): Unit =
            if (open.nonEmpty)
              state.setTimeoutTimestamp(
                math.max((open.keys.min + 1) * dayMs + 1,
                         state.getCurrentWatermarkMs() + 1))
          if (state.hasTimedOut) {
            val s = state.get
            val wm = state.getCurrentWatermarkMs()
            val (closable, stillOpen) = s.open.partition { case (d, _) => (d + 1) * dayMs <= wm }
            var closed = s.closed
            val out = closable.toSeq.sortBy(_._1).map { case (day, c) =>
              val z =
                if (closed.size >= 2) {
                  val n = closed.size
                  val sum = closed.iterator.map(x => BigInt(x._2)).sum
                  val sumSq = closed.iterator.map(x => BigInt(x._2) * BigInt(x._2)).sum
                  val mean = sum.toDouble / n.toDouble
                  val variance = (sumSq.toDouble - sum.toDouble * sum.toDouble / n.toDouble) /
                    (n - 1).toDouble
                  val sd = math.sqrt(variance)
                  if (sd > 0.0) Some(math.floor((c - mean) / sd * 1e6 + 0.5) / 1e6) else None
                } else None
              closed = (closed :+ (day, c)).takeRight(history)
              DayVolume(eventType, day, c, z, z.map(v => math.abs(v) >= zThreshold))
            }
            state.update(AnomalyState(stillOpen, closed))
            armTimeout(stillOpen)
            out.iterator
          } else {
            val s = state.getOption.getOrElse(AnomalyState(Map.empty, Seq.empty))
            var open = s.open
            rows.foreach { r =>
              val day = Math.floorDiv(r.getTimestamp(0).getTime, dayMs)
              open = open.updated(day, open.getOrElse(day, 0L) + 1L)
            }
            state.update(AnomalyState(open, s.closed))
            armTimeout(open)
            Iterator.empty
          }
      }
  }

  /** One attributed conversion, emitted the moment it arrives. */
  case class LiveAttribution(conversion_id: Long, user_id: Long,
                             first_touch: Option[String], last_touch: Option[String],
                             n_touches: Long)

  /** Per-user touch history: (tsUs, eventId, type) triples inside the
    * lookback of the newest event seen, oldest first. */
  case class TouchState(touches: Seq[(Long, Long, String)])

  /** Streaming first/last-touch attribution — the live twin of
    * [[graft.operators.EventAnalytics.attribution]]: per user, keep
    * the touch events within `lookbackUs` of the newest event seen;
    * when a conversion arrives, emit its credit row IMMEDIATELY
    * (Append mode) from the touches observed so far.
    *
    * State is BOUNDED: touches older than the lookback evict as event
    * time advances, and `maxTouches` caps a hyperactive user (oldest
    * evicted first — under cap pressure the reported first_touch can
    * shift later; documented recall trade, the alternative is
    * unbounded per-user retention). Ordering contract mirrors
    * [[funnelStream]]: events are sorted within a micro-batch, so
    * in-order delivery reproduces the batch operator exactly for
    * conversions whose touches all arrived first; a touch arriving in
    * a LATER batch than its conversion cannot retro-credit (the batch
    * operator sees it, the stream already emitted — late completeness
    * provably needs buffering conversions until the watermark, which
    * trades latency for it). Users with state idle longer than the
    * lookback past the watermark are purged via event-time timeout.
    */
  def attributionStream(events: DataFrame, tsCol: String, userCol: String,
                        typeCol: String, idCol: String,
                        touchTypes: Seq[String], conversionType: String,
                        lookbackUs: Long, maxTouches: Int = 256,
                        watermark: String = "10 minutes"): Dataset[LiveAttribution] = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    require(lookbackUs > 0 && maxTouches >= 2,
      s"lookbackUs=$lookbackUs must be positive, maxTouches=$maxTouches >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    val touchSet = touchTypes.toSet
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(userCol).cast("long").as("u"),
        col(typeCol).cast("string").as("et"), col(idCol).cast("long").as("eid"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getLong(1))
      .flatMapGroupsWithState[TouchState, LiveAttribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past lookback+watermark: nothing can attribute
            Iterator.empty
          } else {
            val evs = rows.toArray
              .map(r => (r.getTimestamp(0).getTime * 1000L, r.getLong(3), r.getString(2)))
              .filter(_._3 != null)
              .sortBy(e => (e._1, e._2))
            var touches = state.getOption.map(_.touches.toVector).getOrElse(Vector.empty)
            val out = scala.collection.mutable.ArrayBuffer.empty[LiveAttribution]
            var maxTs = touches.lastOption.map(_._1).getOrElse(Long.MinValue)
            evs.foreach { case (ts, eid, et) =>
              maxTs = math.max(maxTs, ts)
              // evict: outside the lookback of the newest event
              while (touches.nonEmpty && maxTs - touches.head._1 > lookbackUs)
                touches = touches.tail
              if (touchSet.contains(et)) {
                touches = touches :+ ((ts, eid, et))
                if (touches.length > maxTouches) touches = touches.tail
              } else if (et == conversionType) {
                val eligible = touches.filter(t => t._1 <= ts && ts - t._1 <= lookbackUs)
                if (eligible.isEmpty)
                  out += LiveAttribution(eid, userId, None, None, 0L)
                else
                  out += LiveAttribution(eid, userId,
                    Some(eligible.minBy(t => (t._1, t._2))._3),
                    Some(eligible.maxBy(t => (t._1, t._2))._3),
                    eligible.length.toLong)
              }
            }
            if (touches.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(TouchState(touches))
              // purge once nothing in state can credit a future
              // in-order conversion: watermark past newest touch + lookback
              state.setTimeoutTimestamp(
                math.max((touches.last._1 + lookbackUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Final funnel standing for one user: the deepest step reached
    * and the event-time micros at which it was completed. */
  case class UserFunnel(user_id: Long, depth: Int, last_step_ts_us: Long)

  case class FunnelState(depth: Int, anchorUs: Long)

  /** Streaming strict-order funnel (the live twin of
    * [[graft.operators.EventAnalytics.funnel]]): per user, advance a
    * (depth, anchor) state machine — an event of the NEXT step type
    * strictly after the anchor and within `horizonUs` of it deepens
    * the funnel and re-anchors the horizon. State is O(1) per user
    * (two numbers), NEVER a buffered event history — the property
    * that keeps an unbounded 100 TB ingest viable.
    *
    * Emission (Append mode): a user who completes the LAST step
    * emits immediately and drops their state; otherwise the user
    * emits their final depth when the event-time watermark passes
    * `anchor + horizon` — from that point no in-order event can
    * deepen the funnel, so the result is final. Users who never
    * reach step 1 emit nothing.
    *
    * Ordering contract (the honest caveat): within a micro-batch a
    * user's events are sorted by event time before applying the
    * state machine, so single-batch and in-order multi-batch
    * delivery reproduce the batch funnel EXACTLY (asserted in
    * EventStreamSpec). An event that arrives in a LATER micro-batch
    * but carries an EARLIER timestamp than an already-consumed
    * anchor cannot retroactively re-anchor — exact late re-anchoring
    * provably requires unbounded per-user event retention (an
    * adversary can always present an earlier first-step event), and
    * this operator chooses bounded state over unbounded replay. Late
    * events beyond the watermark are dropped by Spark upstream.
    */
  def funnelStream(events: DataFrame, tsCol: String, userCol: String,
                   typeCol: String, steps: Seq[String], horizonUs: Long,
                   watermark: String = "10 minutes"): Dataset[UserFunnel] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.size
    val keyed = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(userCol).cast("long").as("u"),
              col(typeCol).cast("string").as("et"))
    keyed.groupByKey((r: org.apache.spark.sql.Row) => r.getLong(1))
      .flatMapGroupsWithState[FunnelState, UserFunnel](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserFunnel(userId, s.depth, s.anchorUs))
          } else {
            // micro-batch-local event-time sort: bounded by the
            // trigger's rows for this user, not their full history
            val evs = rows.toArray
              .map(r => (r.getTimestamp(0).getTime * 1000L, r.getString(2)))
              .filter(_._2 != null)
              .sortBy(_._1)
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var completed: Option[UserFunnel] = None
            var i = 0
            while (i < evs.length && completed.isEmpty) {
              val (ts, et) = evs(i)
              if (cur.depth < n && stepIdx.get(et).contains(cur.depth) &&
                  (cur.depth == 0 || (ts > cur.anchorUs && ts <= cur.anchorUs + horizonUs))) {
                cur = FunnelState(cur.depth + 1, ts)
                if (cur.depth == n)
                  completed = Some(UserFunnel(userId, n, ts))
              }
              i += 1
            }
            completed match {
              case Some(done) =>
                if (state.exists) state.remove()
                Iterator.single(done)
              case None if cur.depth > 0 =>
                state.update(cur)
                // final once no next-step event can still qualify:
                // watermark past anchor + horizon (clamped above the
                // current watermark — past timeouts are rejected)
                state.setTimeoutTimestamp(
                  math.max((cur.anchorUs + horizonUs) / 1000L + 1,
                           state.getCurrentWatermarkMs() + 1))
                Iterator.empty
              case None =>
                Iterator.empty
            }
          }
      }
  }
}
