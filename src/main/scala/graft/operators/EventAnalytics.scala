package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over an event log
  * (user, event_type, timestamp): ordered conversion funnels and
  * cohort retention — the two standard product-analytics rollups a
  * training-data/telemetry warehouse runs beside the curation
  * pipeline (the batch counterparts of
  * [[graft.streaming.EventStream]]'s sessionization).
  *
  * Scale contract (both operators):
  *  - every shuffle is keyed by the user column and carries only
  *    slim (user, long) rows — event payloads/props never move;
  *  - per-step state is ONE min-timestamp per user (map-side
  *    combined hash aggregation), never a per-user sorted event
  *    list and never a window over a user's full history — a
  *    10^6-event power user costs the same as a 2-event one;
  *  - the final rollups are O(steps) / O(cohorts × offsets) rows.
  *
  * Determinism: all timestamp math is integer micros; counts are
  * longs; the only doubles are single IEEE divisions of two exact
  * longs (bit-identical across engines).
  */
object EventAnalytics {

  /** Strict-order conversion funnel: for the step sequence
    * `steps(0) → steps(1) → … → steps(n-1)`, a user reaches step i
    * iff they have an event of type `steps(i)` STRICTLY after their
    * step-(i-1) completion time and within `horizonUs` micros of it
    * (the per-step conversion window). Step completion time is the
    * EARLIEST qualifying event — the standard strict-funnel
    * semantics (each step re-anchors the window).
    *
    * Returns one row per step:
    * (step, event_type, users, conv_from_first) ordered by step,
    * where conv_from_first = users ÷ users(step 1) as one exact
    * IEEE division (1.0 for the first step; 0/0 → null when the
    * funnel is empty).
    *
    * Plan shape: one slim per-user min-aggregation per step, chained
    * by equi-joins on the user key (every exchange hashes the same
    * key), then a single O(steps)-row unpivot — no windows, no
    * per-user event lists.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsUsCol: String,
             steps: Seq[String], horizonUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsUsCol).cast("long").as("ts"))

    // t1 per user: earliest step-0 event. Each later step LEFT-joins
    // onto the accumulating per-user frame so non-converting users
    // keep their earlier columns (counted at their deepest step).
    var perUser = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("t1"))
    for (i <- 2 to steps.size) {
      val prev = s"t${i - 1}"
      // Only this step's event type shuffles, already halved to
      // (u, ts); the join key equals the aggregation key so AQE can
      // reuse the exchange.
      val stepEv = ev.filter(col("et") === steps(i - 1)).select(col("u"), col("ts"))
      val reached = stepEv.join(perUser.select(col("u"), col(prev)), Seq("u"))
        .filter(col("ts") > col(prev) && col("ts") <= col(prev) + lit(horizonUs))
        .groupBy("u").agg(min(col("ts")).as(s"t$i"))
      perUser = perUser.join(reached.select(col("u"), col(s"t$i")), Seq("u"), "left")
    }

    // One single-row global rollup: reached-counts per step, then an
    // inline unpivot to (step, event_type, users, conv) rows —
    // conv_from_first divides inside the one-row frame, so no window
    // and no second pass.
    val counts = perUser.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (name, idx) =>
      struct(lit(idx + 1).as("step"), lit(name).as("event_type"),
        col(s"c${idx + 1}").as("users"),
        when(col("c1") > 0,
          col(s"c${idx + 1}").cast("double") / col("c1").cast("double"))
          .otherwise(lit(null).cast("double")).as("conv_from_first"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.users"), col("r.conv_from_first"))
      .orderBy("step")
  }

  /** Weekly cohort retention: cohort = the calendar-free week index
    * (days-since-epoch ÷ 7, integer) of the user's FIRST event;
    * week_offset = whole weeks between an event's day and the user's
    * first day. Returns (cohort_week, week_offset, active_users,
    * cohort_size, retention) ordered by (cohort_week, week_offset),
    * where retention = active_users ÷ cohort_size as one exact IEEE
    * division (offset 0 is 1.0 by construction).
    *
    * Plan shape: per-user min-day aggregation (slim), re-join on the
    * user key, distinct on (cohort, offset, user) — an aggregation,
    * not a window — then an O(cohorts)-row self-join for cohort
    * sizes. Day/week indices are pure integer division of micros —
    * no timezone/calendar dependence to drift between engines.
    */
  def retention(events: DataFrame, userCol: String, tsUsCol: String): DataFrame = {
    // Integer `div`, not double `/`: micros-since-epoch (~1.7e15)
    // sits close enough to 2^53 that double round-trips are a trap.
    val ev = events.select(col(userCol).as("u"),
      col(tsUsCol).cast("long").as("ts_us"))
      .select(col("u"), expr("ts_us div 86400000000").as("day"))
    val firstDay = ev.groupBy("u").agg(min(col("day")).as("first_day"))
    val active = ev.join(firstDay, Seq("u"))
      .select(col("u"), expr("first_day div 7").as("cohort_week"),
        expr("(day - first_day) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(col("u")).as("active_users"))
    val sizes = active.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("active_users").as("cohort_size"))
    active.join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention",
        col("active_users").cast("double") / col("cohort_size").cast("double"))
      .select("cohort_week", "week_offset", "active_users", "cohort_size", "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** Daily-volume anomaly detection per event type: z-score each
    * (type, day) count against the type's own mean/stddev over days,
    * flagging |z| ≥ `zThreshold` — the monitoring primitive that
    * catches a collapsed ingest, a bot burst, or a broken tracker in
    * a 100 TB event stream.
    *
    * Determinism: days are pure integer micros FLOOR-division (no
    * calendar engine; floor — not truncate-toward-zero — so
    * pre-epoch timestamps bucket identically to the oracle's `//`
    * and days −1/0 stay distinct); the per-type moments (n, Σc, Σc²)
    * are exact integer aggregates of exact integer counts — Σc² in
    * DECIMAL(38,0), summation-order-immune and exact far beyond the
    * 2^53 double mantissa — and mean/variance/z are ONE fixed-shape
    * IEEE expression over them, bit-replicated by the oracle; z is
    * quantized to 1e-6 before the flag compare.
    *
    * Plan shape: ONE map-side-combined (type, day) count — the only
    * data-sized aggregation; per-type moments roll up the tiny count
    * table; stats broadcast back onto it. Window-free; a type with
    * one observed day (sd undefined) or zero variance yields NULL z
    * and never flags.
    */
  def dailyAnomalies(events: DataFrame, typeCol: String, tsUsCol: String,
                     zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    // Floor division via the always-positive pmod: ts − pmod(ts, d)
    // is the largest multiple of d ≤ ts, so the `div` is exact.
    val counts = events.select(col(typeCol).as("event_type"),
        expr(s"(cast($tsUsCol as long) - pmod(cast($tsUsCol as long), 86400000000))" +
          " div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count("*").as("n_events"))
    val stats = counts.groupBy("event_type").agg(
      count("*").as("__nd"), sum("n_events").as("__s"),
      sum(col("n_events").cast("decimal(19,0)") * col("n_events").cast("decimal(19,0)"))
        .as("__q"))
    val m = col("__s").cast("double") / col("__nd").cast("double")
    val variance = (col("__q").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") /
      col("__nd").cast("double")) / (col("__nd") - lit(1L)).cast("double")
    val sd = sqrt(variance)
    val z = graft.functions.MathFunctions.roundTo(
      (col("n_events").cast("double") - m) / sd, 6)
    counts.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", when(col("__nd") > 1L && sd > 0.0, z))
      .withColumn("is_anomaly", when(col("z").isNotNull, abs(col("z")) >= zThreshold))
      .select("event_type", "day", "n_events", "z", "is_anomaly")
  }

  /** First/last-touch attribution: for every `conversionType` event,
    * find the user's touch events (`touchTypes`) at-or-before the
    * conversion and within `lookbackUs` micros of it, and report the
    * EARLIEST (first-touch) and LATEST (last-touch) touch type plus
    * the touch count — the standard credit-assignment rollup over a
    * telemetry/event warehouse.
    *
    * Determinism: first/last are min/max over (ts, event_id, type)
    * STRUCTS — lexicographic, so simultaneous touches tie-break on
    * the unique event id and both engines agree bit-for-bit; all
    * window math is integer micros. Conversions with no qualifying
    * touch keep a row with NULL touch types and n_touches = 0.
    *
    * Plan shape: conversions and touches are two slim projections of
    * the same scan; ONE equi-join on the user key (the time predicate
    * rides the join) feeds a per-conversion min/max-struct hash
    * aggregation — map-side combined, no windows, no per-user sorted
    * event lists. The join's per-user fan-out is touches × conversions
    * for that user inside the lookback — bounded by the lookback for
    * any realistic activity rate; a pathological single-user firehose
    * is the `saltedJoin` case, not this operator's default.
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsUsCol: String, idCol: String,
                  touchTypes: Seq[String], conversionType: String,
                  lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("user_id"), col(idCol).as("conversion_id"),
        col(tsUsCol).cast("long").as("conv_ts"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__tu"), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), col(tsUsCol).cast("long").as("touch_ts"))
    val attributed = conv.join(touch,
        col("user_id") === col("__tu") &&
          col("touch_ts") <= col("conv_ts") &&
          col("conv_ts") - col("touch_ts") <= lit(lookbackUs))
      .groupBy("conversion_id")
      .agg(
        min(struct(col("touch_ts"), col("touch_id"), col("touch_type"))).as("__ft"),
        max(struct(col("touch_ts"), col("touch_id"), col("touch_type"))).as("__lt"),
        count("*").as("__n"))
    conv.join(attributed, Seq("conversion_id"), "left")
      .select(col("conversion_id"), col("user_id"),
        col("__ft.touch_type").as("first_touch"),
        col("__lt.touch_type").as("last_touch"),
        coalesce(col("__n"), lit(0L)).as("n_touches"))
  }

  /** Per-user event-type co-occurrence with lift (market-basket over
    * the event log): for every unordered type pair (a < b), the number
    * of users exhibiting BOTH, each type's user count, and
    * lift = P(a,b) / (P(a)·P(b)) over users — lift > 1 means the
    * behaviors attract, < 1 means they repel. The companion signal to
    * [[funnel]]/`transitions` when no step order is hypothesized.
    *
    * Scale shape: events reduce to DISTINCT (user, type) rows first —
    * ONE map-side-combined aggregation — so the self-join on the user
    * key fans out to at most |types|² rows per user regardless of how
    * many events the user has (a 10^6-event power user costs the same
    * as a 2-event one; the type DOMAIN is small by nature, it is the
    * event VOLUME that scales). Marginals and the user total are
    * type-cardinality / scalar frames broadcast onto the ≤ |types|²
    * pair rows. Lift is computed on exact longs with single IEEE
    * casts, quantized at 1e-6 — engine-portable.
    */
  def cooccurrence(events: DataFrame, userCol: String, typeCol: String): DataFrame =
    cooccurrenceImpl(events, userCol, typeCol, materialize = true)

  /** [[cooccurrence]] without the persist/checkpoint materialization —
    * the plan-audit seam. */
  private[graft] def cooccurrenceImpl(events: DataFrame, userCol: String,
      typeCol: String, materialize: Boolean): DataFrame = {
    val rd = graft.functions.MathFunctions.roundTo _
    // persisted: the distinct frame feeds four branches (marginals,
    // total, both self-join sides) which column-prune it differently —
    // without the cache their exchanges stop being identical,
    // ReuseExchange misses, and the event log is re-scanned up to 4×
    // (measured). Checkpoint the ≤ |types|² result, free the cache.
    val ut0 = events.select(col(userCol).as("u"), col(typeCol).as("et"))
      .distinct()
    val ut = if (materialize) ut0.persist() else ut0
    val marg = ut.groupBy("et").agg(count("*").as("n_users"))
    val total = ut.agg(countDistinct("u").as("n_total"))
    val pairs = ut.as("a")
      .join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.et") < col("b.et"))
      .groupBy(col("a.et").as("et_a"), col("b.et").as("et_b"))
      .agg(count("*").as("n_both"))
    val raw = pairs
      .join(broadcast(marg.select(col("et").as("et_a"), col("n_users").as("n_a"))), Seq("et_a"))
      .join(broadcast(marg.select(col("et").as("et_b"), col("n_users").as("n_b"))), Seq("et_b"))
      .crossJoin(broadcast(total)) // one scalar row
      .select(col("et_a"), col("et_b"), col("n_both"), col("n_a"), col("n_b"),
        rd(col("n_both").cast("double") * col("n_total").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
    if (!materialize) raw
    else {
      val out = org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointFreshStats(raw)
      ut.unpersist()
      out
    }
  }

  /** Ordered 3-step behavior paths (the length-3 extension of the
    * Markov `transitions` matrix): every consecutive event triple per
    * user, counted corpus-wide with its share of all triples — the
    * "what do users actually DO in sequence" mining step run before a
    * funnel hypothesis exists.
    *
    * Scale shape: the only data-sized operation is the user-keyed
    * sort window producing the two leads — partitioned by user, never
    * global — after which everything rolls up to the ≤ |types|³ path
    * table, and the share denominator is a window over THAT table (the
    * `transitions` precedent), so the events subtree executes exactly
    * once — a scalar cross-join denominator would re-run the scan +
    * window a second time. A path's existence needs its three events
    * to sit consecutively in ONE user's timeline, so the window state
    * per user is two lookahead rows.
    */
  def paths(events: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, eventIdCol: String): DataFrame = {
    val rd = graft.functions.MathFunctions.roundTo _
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(tsUsCol, eventIdCol)
    val triples = events
      .select(col(userCol), col(tsUsCol), col(eventIdCol),
        col(typeCol).as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count("*").as("n"))
    // single-partition window over <= |types|^3 aggregated rows only
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    triples.select(col("e1"), col("e2"), col("e3"), col("n"),
      rd(col("n").cast("double") / sum("n").over(wAll).cast("double"), 6).as("share"))
  }

  /** RFM segmentation (recency / frequency / monetary) — the
    * classic user-value rollup: per user, whole days since their last
    * event (relative to the corpus' newest event), event count, and
    * value sum, plus a four-way segment verdict against the corpus
    * MEANS. The verdict compares INTEGERS only — `r · n_users ≤ Σr`
    * is exactly `r ≤ mean(r)` without ever forming the IEEE quotient,
    * so the boundary users land identically on any engine and any
    * partitioning (the `monetary` double is reported, quantized, but
    * deliberately kept OUT of the verdict).
    *
    * Scale shape: events are scanned ONCE — the map-side-combined
    * per-user aggregation is persisted and every corpus scalar
    * (max ts + Σf + user count, then Σr which needs the max first)
    * is an aggregate over that cached user-sized frame, broadcast
    * back as one-row cross-joins. Without the persist the three uses
    * column-prune the per-user aggregate differently, the exchanges
    * stop being identical, ReuseExchange no longer fires, and the
    * plan re-scans the event log up to 4× (measured). The result is
    * checkpointed so the cache can be freed before returning. No
    * windows, no quantiles — mean cutoffs keep everything one pass.
    */
  def rfm(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String): DataFrame =
    rfmImpl(events, userCol, tsUsCol, valueCol, materialize = true)

  /** [[rfm]] without the persist/checkpoint materialization — the
    * plan-audit seam. */
  private[graft] def rfmImpl(events: DataFrame, userCol: String,
      tsUsCol: String, valueCol: String, materialize: Boolean): DataFrame = {
    val rd = graft.functions.MathFunctions.roundTo _
    val perUser0 = events.groupBy(col(userCol).as("user_id"))
      .agg(max(col(tsUsCol)).as("last_ts"),
        count("*").as("frequency"),
        sum(col(valueCol)).as("m_raw"))
    val perUser = if (materialize) perUser0.persist() else perUser0
    val scal = perUser.agg(max(col("last_ts")).as("corpus_max"),
      sum("frequency").as("tot_f"), count("*").as("n_users"))
    val withR = perUser.crossJoin(broadcast(scal)) // one scalar row
      .select(col("user_id"),
        // integer `div`, not `/`: the IEEE quotient of two ~1e15
        // micros values can land one ulp under an exact day multiple
        // and truncate to k−1 — the oracle's integer division never does
        expr("(corpus_max - last_ts) div 86400000000").as("recency_days"),
        col("frequency"), col("m_raw"), col("tot_f"), col("n_users"))
    val totR = withR.agg(sum("recency_days").as("tot_r"))
    val raw = withR.crossJoin(broadcast(totR)) // one scalar row
      .select(col("user_id"), col("recency_days"), col("frequency"),
        // 4 dp like every sum-of-double oracle column here: the wider
        // quantum absorbs partition-order FP drift
        rd(col("m_raw"), 4).as("monetary"),
        when(col("recency_days") * col("n_users") <= col("tot_r"),
          when(col("frequency") * col("n_users") >= col("tot_f"), "core")
            .otherwise("casual"))
          .otherwise(
            when(col("frequency") * col("n_users") >= col("tot_f"), "lapsed_heavy")
              .otherwise("dormant")).as("segment"))
    if (!materialize) raw
    else {
      val out = org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointFreshStats(raw)
      perUser.unpersist()
      out
    }
  }
}
