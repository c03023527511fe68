package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Structured Streaming over the events table: watermarked windowed
  * aggregation (driven by the real sf0.001 parquet as a file stream)
  * and stateful gap sessionization.
  */
class EventStreamSpec extends SparkSpec {

  import spark.implicits._

  test("windowed counts over the events file stream match the batch query") {
    // the file stream source wants a directory — stage the single file
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001/events.parquet")),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val agg = EventStream.windowedCounts(
      EventStream.readEvents(spark, dir), "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_win")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(30000); q.stop()
    val streamed = spark.sql(
      "SELECT event_type, sum(n) AS n FROM ev_win GROUP BY event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch ground truth
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("gap sessionization groups events and splits on gaps") {
    def ev(id: Long, user: Long, ms: Long, v: Double) =
      Event(id, new Timestamp(ms), user, "click", v)
    // user 1: two sessions (gap 10s with 3s threshold); user 2: one.
    val events = Seq(
      ev(1, 1, 1000, 1.0), ev(2, 1, 2000, 2.0), ev(3, 1, 3000, 3.0),
      ev(4, 1, 13000, 4.0), ev(5, 1, 14000, 5.0),
      ev(6, 2, 1000, 10.0))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    stream.addData(events)
    val q = EventStream.sessionize(stream.toDS(), gapMillis = 3000)
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val closed = spark.sql("SELECT * FROM sessions").as[Session].collect()
    // only user 1's FIRST session is closed (the gap closed it);
    // trailing sessions stay in state awaiting more data.
    assert(closed.length == 1)
    val s = closed(0)
    assert(s.user_id == 1 && s.n_events == 3 && s.sum_value == 6.0)
    assert(s.start_ms == 1000 && s.end_ms == 3000)
  }

  test("sessionize: cross-batch out-of-order event does not regress the session end") {
    def ev(id: Long, user: Long, ms: Long, v: Double) =
      Event(id, new Timestamp(ms), user, "click", v)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = EventStream.sessionize(stream.toDS(), gapMillis = 3000)
      .writeStream.outputMode("append").format("memory").queryName("oo_sessions")
      .start()
    stream.addData(Seq(ev(1, 1, 1000, 1.0), ev(2, 1, 2000, 1.0)))
    q.processAllAvailable()
    // batch 2: a LATE event (1500 < stored end 2000), then 4800 —
    // within gap of the TRUE end (2000) but beyond gap of the late
    // event; the old end=t regression would wrongly split here
    stream.addData(Seq(ev(3, 1, 1500, 1.0)))
    q.processAllAvailable()
    stream.addData(Seq(ev(4, 1, 4800, 1.0)))
    q.processAllAvailable()
    stream.addData(Seq(ev(5, 1, 99999, 1.0))) // closes the session
    q.processAllAvailable(); q.stop()
    val closed = spark.sql("SELECT * FROM oo_sessions").as[Session].collect()
    assert(closed.length == 1, s"one merged session, got ${closed.toSeq}")
    val s = closed(0)
    assert(s.start_ms == 1000 && s.end_ms == 4800 && s.n_events == 4,
      s"late event widened, 4800 merged against the true end: $s")
  }

  test("stream-static enrichment: broadcast dimension join, unmatched rows kept") {
    def ev(id: Long, user: Long, ms: Long, v: Double) =
      Event(id, new Timestamp(ms), user, "click", v)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    stream.addData(Seq(ev(1, 1, 1000, 1.0), ev(2, 2, 2000, 2.0), ev(3, 99, 3000, 3.0)))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = EventStream.enrich(stream.toDF(), dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT event_id, tier FROM enriched ORDER BY event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(out == Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None)),
      s"left enrichment keeps unmatched user 99: $out")
  }

  test("streaming dedup: first arrival per fingerprint passes, dups dropped, state bounded") {
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    def d(id: Long, ms: Long, text: String) = (id, new Timestamp(ms), text)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(Seq(
      d(1, 1000, "alpha beta"), d(2, 2000, "alpha   BETA"), // dup after normalization
      d(3, 3000, "gamma"), d(4, 4000, "alpha beta"),        // dup again
      d(5, 5000, "delta")))
    val docs = stream.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupStream(docs, "text", "ts", "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT doc_id FROM dedup_stream ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L, 5L), s"first arrivals only, got $out")
  }

  test("streaming HLL distinct: closed-window estimates equal the batch sketch bit-for-bit") {
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, String)](spark)
    val out = EventStream.hllDistinctStream(
      stream.toDF().toDF("ts", "v"), "ts", "v",
      windowMillis = 60000L, watermark = "0 seconds", p = 11)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hll_win").start()
    // window A [0, 60s): 500 rows over 137 distinct users (dup-heavy);
    // window B [60s, 120s): 100 distinct
    val winA = (0 until 500).map(i => (new Timestamp(i * 100L), s"user_${i % 137}"))
    val winB = (0 until 100).map(i => (new Timestamp(60000L + i * 100L), s"user_b_$i"))
    stream.addData(winA ++ winB)
    q.processAllAvailable()
    // advance the watermark in two steps so both windows time out and
    // emit their one final row each
    stream.addData(Seq((new Timestamp(600000L), "sentinel")))
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(1200000L), "sentinel2")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM hll_win")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
    assert(got.contains(0L) && got.contains(60000L), s"both windows closed once: $got")
    def batchEst(rows: Seq[(Timestamp, String)]): Double =
      graft.operators.Sketches.hllDistinct(rows.map(_._2).toDF("v"), "v", Seq.empty, p = 11)
        .collect()(0).getAs[Double]("hll_estimate")
    // bit-identical, not merely close: same portable hash, same
    // integer harmonic fold, same rounding as the batch sketch
    assert(got(0L) == batchEst(winA), s"window A: stream ${got(0L)} vs batch ${batchEst(winA)}")
    assert(got(60000L) == batchEst(winB), s"window B: stream ${got(60000L)} vs batch ${batchEst(winB)}")
  }

  test("streaming quantile sketch: closed-window estimates equal the batch sketch bit-for-bit") {
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Double)](spark)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val out = EventStream.quantileStream(
      stream.toDF().toDF("ts", "v"), "ts", "v",
      windowMillis = 60000L, lo = 0.0, hi = 1024.0, numBuckets = 16,
      quantiles = qs, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quant_win").start()
    // window A: skewed values (squares mod domain); window B: uniform.
    // +1 ms offset: a ts-0 row is late against the INITIAL watermark
    // and would be dropped before it ever reaches the sketch state
    val winA = (0 until 500).map(i => (new Timestamp(i * 100L + 1), (i * i % 1000).toDouble))
    val winB = (0 until 200).map(i => (new Timestamp(60000L + i * 100L), i * 5.0))
    stream.addData(winA ++ winB)
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(600000L), 1.0)))
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(1200000L), 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM quant_win").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getDouble(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // one row per (window, quantile) for BOTH data windows (sentinel
    // rows close their own late windows too — those aren't asserted)
    qs.foreach { qq =>
      assert(got.contains((0L, qq)) && got.contains((60000L, qq)), s"missing ($qq): $got")
    }
    assert(got((0L, qs.head))._2 == 500L && got((60000L, qs.head))._2 == 200L,
      s"window row counts: $got")
    def batch(rows: Seq[(Timestamp, Double)]): Map[Double, (Double, Long)] =
      graft.operators.Sketches.quantileSketch(
          rows.map(t => ("g", t._2)).toDF("g", "v"), "v", Seq("g"),
          lo = 0.0, hi = 1024.0, numBuckets = 16, quantiles = qs)
        .collect().map(r => r.getDouble(1) -> (r.getDouble(2), r.getLong(3))).toMap
    val bA = batch(winA); val bB = batch(winB)
    qs.foreach { qq =>
      assert(got((0L, qq)) == bA(qq), s"window A q=$qq: ${got((0L, qq))} vs ${bA(qq)}")
      assert(got((60000L, qq)) == bB(qq), s"window B q=$qq: ${got((60000L, qq))} vs ${bB(qq)}")
    }
  }

  test("streaming CMS heavy hitters: closed-window top-k equals the batch sketch bit-for-bit") {
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, String)](spark)
    val out = EventStream.cmsTopKStream(
      stream.toDF().toDF("ts", "v"), "ts", "v",
      windowMillis = 60000L, d = 4, w = 64, k = 5, maxCandidates = 64,
      watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cms_win").start()
    // window A: zipfish skew over 30 items (item_j appears ~300/(j+1)
    // times); window B: mild skew over 40 items. w = 64 forces real
    // hash collisions so the parity check exercises them.
    val winA = (0 until 30).flatMap(j => (0 to 300 / (j + 1)).map(c =>
      (new Timestamp(1L + j * 97L + c * 13L), s"item_$j")))
    val winB = (0 until 40).flatMap(j => (0 to (if (j < 5) 50 else 3)).map(c =>
      (new Timestamp(60000L + j * 91L + c * 17L), s"b_item_$j")))
    stream.addData(winA ++ winB)
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(600000L), "sentinel")))
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(1200000L), "sentinel2")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM cms_win").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    def batch(rows: Seq[(Timestamp, String)]): Seq[(String, Long, Long)] =
      graft.operators.Sketches.cmsTopK(rows.map(_._2).toDF("v"), "v", d = 4, w = 64, k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val bA = batch(winA); val bB = batch(winB)
    // maxCandidates (64) was never exceeded in either window, so
    // membership, CMS estimates (collisions included), exact counts,
    // and the (estimate desc, item asc) order all match the batch
    // sketch exactly
    bA.zipWithIndex.foreach { case (exp, i) =>
      assert(got((0L, i + 1)) == exp, s"window A rank ${i + 1}: ${got((0L, i + 1))} vs $exp")
    }
    bB.zipWithIndex.foreach { case (exp, i) =>
      assert(got((60000L, i + 1)) == exp, s"window B rank ${i + 1}: ${got((60000L, i + 1))} vs $exp")
    }
  }

  private def runFunnel(batches: Seq[Seq[(Timestamp, Long, String)]],
                        horizonUs: Long,
                        sentinelMs: Long): Seq[(Long, Int, Long)] = {
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, String)](spark)
    val out = EventStream.funnelStream(
      stream.toDF.toDF("ts", "u", "et"), "ts", "u", "et",
      Seq("view", "click", "purchase"), horizonUs, watermark = "0 seconds")
    val name = s"funnel_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    // sentinel advances the watermark past every open horizon
    stream.addData(Seq((new Timestamp(sentinelMs), 999999L, "noise")))
    q.processAllAvailable()
    // a second nudge lets the state-store timeout fire in its own batch
    stream.addData(Seq((new Timestamp(sentinelMs + 1000L), 999999L, "noise")))
    q.processAllAvailable(); q.stop()
    spark.sql(s"SELECT user_id, depth, last_step_ts_us FROM $name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(_._1)
  }

  test("streaming funnel: closed per-user depths equal the batch funnel") {
    val H = 5000000L // 5 s in micros
    def t(ms: Long) = new Timestamp(ms)
    // user 1: full funnel; user 2: view+click, purchase too late;
    // user 3: view only; user 4: click before view (never starts
    // step 2 — the click precedes its anchor).
    val events = Seq(
      (t(1000), 1L, "view"), (t(2000), 1L, "click"), (t(3000), 1L, "purchase"),
      (t(1000), 2L, "view"), (t(2000), 2L, "click"), (t(2000 + 5001), 2L, "purchase"),
      (t(1500), 3L, "view"),
      (t(500), 4L, "click"), (t(1000), 4L, "view"))
    val got = runFunnel(Seq(events), H, sentinelMs = 60000L)
    assert(got === Seq((1L, 3, 3000000L), (2L, 2, 2000000L),
      (3L, 1, 1500000L), (4L, 1, 1000000L)))
    // cross-check against the batch operator on identical data
    val batchDf = events.map { case (ts, u, et) => (u, et, ts.getTime * 1000L) }
      .toDF("u", "et", "ts_us")
    val batch = graft.operators.EventAnalytics.funnel(
        batchDf, "u", "et", "ts_us", Seq("view", "click", "purchase"), H)
      .collect().map(r => r.getLong(2)).toSeq
    val depthCounts = (1 to 3).map(d => got.count(_._2 >= d).toLong)
    assert(depthCounts === batch,
      s"streamed depth counts $depthCounts vs batch funnel $batch")
  }

  test("streaming funnel: completing the last step emits immediately, before any watermark") {
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Long, String)](spark)
    val out = EventStream.funnelStream(
      stream.toDF.toDF("ts", "u", "et"), "ts", "u", "et",
      Seq("view", "click"), horizonUs = 10000000L, watermark = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_now").start()
    stream.addData(Seq((new Timestamp(1000), 7L, "view"),
      (new Timestamp(2000), 7L, "click")))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT user_id, depth FROM funnel_now")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((7L, 2)), "completion must not wait for the watermark")
  }

  test("streaming funnel: in-order cross-batch delivery deepens the same funnel state") {
    def t(ms: Long) = new Timestamp(ms)
    val got = runFunnel(Seq(
      Seq((t(1000), 1L, "view")),
      Seq((t(2000), 1L, "click")),
      Seq((t(3000), 1L, "purchase"))), horizonUs = 5000000L, sentinelMs = 60000L)
    assert(got === Seq((1L, 3, 3000000L)))
  }

  test("streaming attribution: immediate credit, lookback eviction, tie-break, touch cap") {
    // offset off epoch 0: a row whose event time sits AT the initial
    // watermark (0) is dropped by the stateful late-row filter
    val base = 1000000000L
    def ev(id: Long, user: Long, us: Long, et: String) =
      Event(id, new Timestamp((base + us) / 1000), user, et, 0.0)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = EventStream.attributionStream(stream.toDS().toDF(), "ts", "user_id",
        "event_type", "event_id", touchTypes = Seq("view", "click"),
        conversionType = "purchase", lookbackUs = 100000L, maxTouches = 2)
      .writeStream.outputMode("append").format("memory").queryName("live_attr")
      .start()
    stream.addData(Seq(
      // user 1: the batch-operator parity case (ts in micros via ms*1000)
      ev(10, 1, 0L, "view"), ev(11, 1, 50000L, "click"), ev(12, 1, 100000L, "purchase"),
      // user 2: touch outside the lookback at conversion time → zero-touch row
      ev(20, 2, 0L, "view"), ev(22, 2, 150000L, "purchase"),
      // user 4: simultaneous view/click — unique id breaks the tie
      ev(40, 4, 40000L, "view"), ev(41, 4, 40000L, "click"), ev(42, 4, 90000L, "purchase")))
    q.processAllAvailable()
    // emission is IMMEDIATE — no watermark advance needed
    val batch1 = spark.sql("SELECT * FROM live_attr ORDER BY conversion_id")
      .as[EventStream.LiveAttribution].collect().toSeq
    assert(batch1.map(a => (a.conversion_id, a.first_touch, a.last_touch, a.n_touches)) === Seq(
      (12L, Some("view"), Some("click"), 2L),
      (22L, None, None, 0L),
      (42L, Some("view"), Some("click"), 2L)))
    // cross-batch: user 5's touches arrive in an earlier batch than the
    // conversion; maxTouches = 2 evicts the OLDEST of three touches, so
    // first_touch shifts to the second (the documented cap trade)
    stream.addData(Seq(ev(50, 5, 10000L, "view"), ev(51, 5, 20000L, "click"),
      ev(52, 5, 30000L, "view")))
    q.processAllAvailable()
    stream.addData(Seq(ev(53, 5, 60000L, "purchase")))
    q.processAllAvailable(); q.stop()
    val u5 = spark.sql("SELECT * FROM live_attr WHERE conversion_id = 53")
      .as[EventStream.LiveAttribution].collect()(0)
    assert(u5.first_touch.contains("click") && u5.last_touch.contains("view") &&
      u5.n_touches == 2L, s"cap evicts oldest: $u5")
  }

  test("streaming anomaly: days close in order, prequential z vs trailing history, spike flags") {
    val dayMs = 86400000L
    def ev(day: Long, k: Int) = // k events at that day's noon
      (0 until k).map(i => Event(day * 100 + i, new Timestamp(day * dayMs + 43200000L + i),
        1L, "click", 0.0))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = EventStream.anomalyStream(stream.toDS().toDF(), "ts", "event_type",
        zThreshold = 2.0, history = 28, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("anom")
      .start()
    // day volumes: 3, 4, 5 (baseline), then... days close as the
    // watermark (max event time − 1 h) passes each day end
    Seq(ev(0, 3), ev(1, 4), ev(2, 5), ev(3, 3), ev(30, 1)).foreach { batch =>
      stream.addData(batch); q.processAllAvailable()
    }
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT * FROM anom ORDER BY day")
      .as[EventStream.DayVolume].collect().toSeq
    assert(got.map(d => (d.day, d.n_events)) === Seq((0L, 3L), (1L, 4L), (2L, 5L), (3L, 3L)),
      s"all watermark-passed days closed in order: $got")
    // first two closed days: no baseline yet → NULL z, NULL flag
    assert(got(0).z.isEmpty && got(0).is_anomaly.isEmpty)
    assert(got(1).z.isEmpty)
    // day 2 scores against trailing {3, 4}: mean 3.5, sd √0.5 →
    // z = 1.5/0.70710678… = 2.121320 (quantized 1e-6) → flags at 2.0
    assert(got(2).z.contains(2.12132) && got(2).is_anomaly.contains(true), s"${got(2)}")
    // day 3 against trailing {3, 4, 5}: mean 4, sd 1 → z = −1, no flag
    assert(got(3).z.contains(-1.0) && got(3).is_anomaly.contains(false), s"${got(3)}")
  }

  test("streaming lifecycle: new/retained/resurrected live, churn by watermark or inline on a gap") {
    val dayMs = 86400000L
    def ev(id: Long, u: Long, day: Long, offMs: Long = 43200000L) =
      Event(id, new Timestamp(day * dayMs + offMs), u, "click", 0.0)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = EventStream.lifecycleStream(stream.toDS().toDF(), "ts", "user_id",
        watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("lifec").start()
    // batch 1: u1 new on day 1 (5 events — volume never re-emits);
    // u2 new on day 1. Watermark stays at day 1 — nothing ages.
    stream.addData((0 until 5).map(i => ev(100 + i, 1L, 1L, 1000L + i)) :+
      ev(200, 2L, 1L))
    q.processAllAvailable()
    val b1 = spark.sql("SELECT * FROM lifec").as[EventStream.LifecycleEvent]
      .collect().toSet
    assert(b1 === Set(
      EventStream.LifecycleEvent(1L, 1L, "new"),
      EventStream.LifecycleEvent(2L, 1L, "new")), s"$b1")
    // batch 2: u1 day 2 → retained; u2 jumps to day 4 in-order → the
    // gap's churned@2 emits INLINE plus resurrected@4
    stream.addData(Seq(ev(300, 1L, 2L), ev(201, 2L, 4L)))
    q.processAllAvailable()
    // sentinels push the watermark → u1's churned@3 and u2's
    // churned@5 fire by timeout
    stream.addData(Seq(ev(400, 99L, 10L)))
    q.processAllAvailable()
    stream.addData(Seq(ev(401, 99L, 20L)))
    q.processAllAvailable()
    // u1 returns on day 30 (ahead of the day-20 watermark — a return
    // BEHIND the watermark is a late event and is honestly dropped)
    // → resurrected, and the timeout-emitted churn is NOT duplicated
    stream.addData(Seq(ev(500, 1L, 30L)))
    q.processAllAvailable()
    q.stop()
    val all = spark.sql("SELECT * FROM lifec").as[EventStream.LifecycleEvent]
      .collect().toSeq
    val u1 = all.filter(_.user_id == 1L).sortBy(e => (e.day, e.transition))
    assert(u1 === Seq(
      EventStream.LifecycleEvent(1L, 1L, "new"),
      EventStream.LifecycleEvent(1L, 2L, "retained"),
      EventStream.LifecycleEvent(1L, 3L, "churned"),
      EventStream.LifecycleEvent(1L, 30L, "resurrected")), s"$u1")
    val u2 = all.filter(_.user_id == 2L).sortBy(e => (e.day, e.transition))
    assert(u2 === Seq(
      EventStream.LifecycleEvent(2L, 1L, "new"),
      EventStream.LifecycleEvent(2L, 2L, "churned"),
      EventStream.LifecycleEvent(2L, 4L, "resurrected"),
      EventStream.LifecycleEvent(2L, 5L, "churned")), s"$u2")
    assert(all.count(_.transition == "churned") === 5,
      s"u1@3, u2@2, u2@5, u99@11 inline + u99@21 by timeout: $all")
  }

  test("streaming bots: burst pages instantly, sustained waits for watermark-final minutes, latches once") {
    val minMs = 60000L
    val base = 1000L // minute index offset dodges the epoch-0 watermark gotcha
    def ev(id: Long, u: Long, minute: Long, offMs: Long) =
      Event(id, new Timestamp((base + minute) * minMs + offMs), u, "click", 0.0)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val q = EventStream.botStream(stream.toDS().toDF(), "ts", "user_id",
        burstPerMinute = 30, sustainedPerMinute = 2, minEvents = 50,
        watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("bots").start()
    // u1: 30 events inside ONE minute → burst, emitted from the very
    // batch that crosses the threshold (no watermark wait).
    // u2: exactly 2 events/minute over 25 minutes (50 total) — the
    // sustained rule becomes true only once ALL 25 minutes close.
    // u3: 10 events over 5 minutes — rate 2 but under minEvents.
    val batch1 =
      (0 until 30).map(i => ev(100 + i, 1L, 0L, i * 100L)) ++
      (0 until 25).flatMap(m => Seq(ev(200 + 2 * m, 2L, m.toLong, 10L),
                                    ev(201 + 2 * m, 2L, m.toLong, 20L))) ++
      (0 until 10).map(i => ev(300 + i, 3L, (i / 2).toLong, i * 50L))
    stream.addData(batch1)
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT * FROM bots").as[EventStream.BotFlag].collect()
    assert(afterB1.toSeq === Seq(EventStream.BotFlag(1L, "burst", base, 30L, 1L, 30L)),
      s"burst pages from its own batch, live totals: ${afterB1.toSeq}")
    // u1 floods again → the latch must NOT re-page; sentinels advance
    // the watermark so u2's minutes close (0..23 first, then 24).
    stream.addData((0 until 30).map(i => ev(400 + i, 1L, 6L, i * 100L)) :+
      ev(500, 99L, 30L, 0L))
    q.processAllAvailable()
    stream.addData(Seq(ev(501, 99L, 40L, 0L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM bots ORDER BY user_id")
      .as[EventStream.BotFlag].collect().toSeq
    assert(got === Seq(
      EventStream.BotFlag(1L, "burst", base, 30L, 1L, 30L),
      EventStream.BotFlag(2L, "sustained", base + 24L, 50L, 25L, 2L)),
      s"one flag per (user, verdict); sustained numbers watermark-final: $got")
  }

  test("streaming domain quality: per-(window, source) counts exact, distinct estimate equals the batch HLL bit-for-bit") {
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, String, String)](spark)
    val out = EventStream.domainQualityStream(
      stream.toDF().toDF("ts", "source", "text"), "ts", "source", "text",
      windowMillis = 60000L, watermark = "0 seconds", minTokens = 20, p = 11)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("domq_win").start()
    val longText = (1 to 25).map(i => s"w$i").mkString(" ")
    // +1 ms offsets: a ts-0 row is late against the INITIAL watermark.
    // window A: spam.com floods 40 copies of one short page (dup-heavy
    // AND short); good.net sends 30 distinct long pages.
    val winA =
      (0 until 40).map(i => (new Timestamp(i * 100L + 1), "spam.com", "Buy   Now")) ++
      (0 until 30).map(i => (new Timestamp(i * 100L + 1), "good.net", s"$longText uniq$i"))
    // window B: spam.com reforms — 10 distinct long pages
    val winB = (0 until 10).map(i =>
      (new Timestamp(60000L + i * 100L), "spam.com", s"$longText b$i"))
    stream.addData(winA ++ winB)
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(600000L), "sentinel", "x")))
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(1200000L), "sentinel2", "y")))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM domq_win")
      .as[EventStream.WindowDomainQuality].collect()
      .map(r => (r.window_start.getTime, r.source) -> r).toMap
    // hand-replicated yardstick: the same register occupancy + the
    // small-range (linear-counting) correction the operator documents
    // — exact equality, not tolerance
    val m = 2048
    def expectEst(texts: Seq[String]): Double = {
      val buckets = texts.map { t =>
        val fp = org.apache.commons.codec.digest.DigestUtils.md5Hex(
          t.trim.toLowerCase.replaceAll("\\s+", " "))
        val h = graft.plans.TextExprs.md5Hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(fp))
        (h % m).toInt
      }.toSet
      val empty = m - buckets.size
      math.floor(m * math.log(m.toDouble / empty) * 1e3 + 0.5) / 1e3
    }
    val spamA = got((0L, "spam.com"))
    assert(spamA.n_docs == 40L && spamA.short_frac == 1.0)
    // one distinct page → one occupied register → est 2048·ln(2048/2047)
    assert(spamA.distinct_est == 1.0, s"corrected 1-distinct est: $spamA")
    assert(spamA.dup_frac_est == 0.975, s"1 - 1/40: $spamA") // the alarm fires
    val goodA = got((0L, "good.net"))
    assert(goodA.n_docs == 30L && goodA.short_frac == 0.0)
    val expGood = expectEst(winA.filter(_._2 == "good.net").map(_._3))
    assert(goodA.distinct_est == expGood, s"${goodA.distinct_est} vs $expGood")
    // healthy domain: estimate ≈ n → dup estimate near 0, far below spam
    assert(goodA.dup_frac_est < 0.2 && spamA.dup_frac_est > 0.8,
      s"good ${goodA.dup_frac_est} vs spam ${spamA.dup_frac_est}")
    val spamB = got((60000L, "spam.com"))
    assert(spamB.n_docs == 10L && spamB.short_frac == 0.0,
      "window B is a fresh state: no carry-over from window A")
  }

  test("streaming drift: closed-window PSI matches the batch term arithmetic; fresh state per window") {
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Array[Float])](spark)
    // three unit-axis centroids in QUANTIZED coords (1.0 → 1e6); the
    // reference corpus saw a balanced 10/10/10 histogram
    val cents = Seq(
      Seq(1e6, 0.0, 0.0, 0.0),
      Seq(0.0, 1e6, 0.0, 0.0),
      Seq(0.0, 0.0, 1e6, 0.0))
    val ref = Seq(10L, 10L, 10L)
    val out = EventStream.driftStream(
      stream.toDF().toDF("ts", "v"), "ts", "v", cents, ref,
      windowMillis = 60000L, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift_win").start()
    def vec(c: Int) = Array.tabulate(4)(j => if (j == c) 1f else 0f)
    // window A drifts hard toward cell 0: 6/3/0. window B is balanced.
    val winA = (0 until 6).map(i => (new Timestamp(i * 100L + 1), vec(0))) ++
      (0 until 3).map(i => (new Timestamp(i * 100L + 1), vec(1)))
    val winB = (0 until 3).flatMap(c =>
      (0 until 2).map(i => (new Timestamp(60000L + c * 1000L + i), vec(c))))
    stream.addData(winA ++ winB)
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(600000L), vec(0))))
    q.processAllAvailable()
    stream.addData(Seq((new Timestamp(1200000L), vec(0))))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM drift_win")
      .as[EventStream.WindowDrift].collect()
      .map(r => r.window_start.getTime -> r).toMap
    // yardstick: the EXACT batch-term arithmetic replayed serially
    def terms(hist: Seq[Long]): Seq[Long] = {
      val n = hist.sum
      (0 until 3).map { c =>
        val pA = (ref(c) + 1L).toDouble / (ref.sum + 3).toDouble
        val pB = (hist(c) + 1L).toDouble / (n + 3).toDouble
        math.floor((pA - pB) * math.log(pA / pB) * 1e6 + 0.5).toLong
      }
    }
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val a = got(0L)
    val tA = terms(Seq(6L, 3L, 0L))
    assert(a.n == 9L)
    assert(a.psi == q6(tA.sum.toDouble / 1e6), s"psi ≡ Σ quantized terms: $a vs $tA")
    assert(a.psi > 0.1, s"hard drift reads large: $a")
    val worst = tA.indices.maxBy(i => (math.abs(tA(i)), -i))
    assert(a.worst_cell == worst && a.worst_term == q6(tA(worst).toDouble / 1e6),
      s"worst cell triage: $a vs $tA")
    val b = got(60000L)
    assert(b.n == 6L, "window B is fresh state — no carry-over")
    val tB = terms(Seq(2L, 2L, 2L))
    assert(b.psi == q6(tB.sum.toDouble / 1e6), s"balanced window: $b vs $tB")
    assert(b.psi < 0.05, s"balanced ingest reads near zero: $b")
  }
}
