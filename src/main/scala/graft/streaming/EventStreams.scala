package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming at all (SURVEY.md §2.9) — this is
  * north-star surplus, built on the standard Spark primitives that scale to
  * a real cluster: event-time watermarks bound state, windowed/session
  * aggregations shuffle on (window, key), and the custom-state path uses
  * `mapGroupsWithState` with event-time timeouts so state is evicted
  * deterministically. Every transform here works identically on a batch
  * DataFrame (same API), which is how the specs exercise golden values.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark bounding state. */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window event rates. */
  def slidingRates(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  /** Session windows (30-minute gap) via the built-in session_window —
    * state merges adjacent events server-side, one shuffle on user_id. */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("n_events"), col("first_ts"), col("last_ts"))

  case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
      last_type: String)

  /** Custom keyed state via mapGroupsWithState: per-user running counters
    * with processing-time timeout eviction — the
    * `KeyValueGroupedDataset.mapGroupsWithState` surface from the brief. */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0, ""))
          // deterministic in-batch order
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = evs.foldLeft(prev) { (acc, e) =>
            UserRunning(user, acc.n_events + 1,
              acc.total_value + math.floor(e.value * 1000) / 1000,
              e.event_type)
          }
          state.update(next)
          next
      }
  }

  case class FunnelEvent(user_id: Long, t_us: Long, event_id: Long,
      event_type: String)
  case class FunnelAnchors(user_id: Long, t1_us: Long, t2_us: Long,
      t3_us: Long)
  case class FunnelAnchorsN(user_id: Long, ts_us: Seq[Long])

  /** N-step streaming first-touch funnel via mapGroupsWithState: per-user
    * anchor state is a FIXED-SIZE array, one Long per step (−1 = unset;
    * 8·N bytes per user regardless of event volume — the 100 TB shape),
    * folded over each batch's events in the (t_us, event_id) total order.
    * Anchors only ever move −1 → set, so under ts-monotone batch arrival
    * (the crawl-snapshot staging contract) the drained state equals the
    * batch [[graft.operators.Funnel.firstTouch]] exactly: the first
    * qualifying event seen in order IS the earliest, and step i anchors
    * strictly after step i−1 within `gapMicros`. Monotone per field, so
    * an Update-mode sink collapses to the final state with a plain max.
    * Timestamps pre-converted to exact integer micros upstream
    * (java.sql.Timestamp.getTime is millis — it never enters this
    * path). `steps` must be ≥ 2 distinct event types. */
  def streamingFunnelN(events: Dataset[FunnelEvent], steps: Seq[String],
      gapMicros: Long): Dataset[FunnelAnchorsN] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size &&
      gapMicros > 0)
    val n = steps.size
    val idx = steps.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvent],
            state: GroupState[FunnelAnchorsN]) =>
          val ts = state.getOption.map(_.ts_us.toArray)
            .getOrElse(Array.fill(n)(-1L))
          for (e <- it.toSeq.sortBy(e => (e.t_us, e.event_id)))
            idx.get(e.event_type).foreach { i =>
              if (ts(i) < 0 && (i == 0 || (ts(i - 1) >= 0 &&
                  e.t_us > ts(i - 1) && e.t_us <= ts(i - 1) + gapMicros)))
                ts(i) = e.t_us
            }
          val next = FunnelAnchorsN(user, ts.toSeq)
          state.update(next)
          next
      }
  }

  /** The 3-step [[streamingFunnelN]] with the flat (t1, t2, t3) state
    * shape the s30 row and its oracle consume. */
  def streamingFunnel(events: Dataset[FunnelEvent], steps: Seq[String],
      gapMicros: Long): Dataset[FunnelAnchors] = {
    require(steps.size == 3, s"streamingFunnel is the 3-step shape; use " +
      s"streamingFunnelN for ${steps.size} steps")
    val spark = events.sparkSession
    import spark.implicits._
    streamingFunnelN(events, steps, gapMicros)
      .map(a => FunnelAnchors(a.user_id, a.ts_us(0), a.ts_us(1), a.ts_us(2)))
  }

  case class DayEvent(user_id: Long, day_us: Long)
  case class RetentionState(user_id: Long, cohort_us: Long, offsets: Long)
  case class RetentionBlocks(user_id: Long, cohort_us: Long,
      block_ids: Seq[Int], bitmaps: Seq[Long])
  case class RetentionBlock(user_id: Long, cohort_us: Long, block_id: Int,
      bitmap: Long)

  private val DayUs = 86400000000L

  /** Streaming retention-cohort maintenance: per-user state is the cohort
    * day (first day ever seen — fixed once set under ts-monotone batch
    * arrival) plus a BITMAP of active day-offsets — 16 bytes per user
    * regardless of event volume, the 100 TB state shape. Offsets must fit
    * bits 0..62 (a ~2-month program; [[streamingRetentionSharded]] is the
    * longer-program form that shards the bitmap per offset block); an
    * offset ≥ 63 raises rather than silently wrapping. Both fields are
    * MONOTONE (cohort constant after set; bits only turn on, and bit 63
    * is never used, so the Long value only grows) — which is exactly what
    * lets an Update-mode sink collapse to the final state with a plain
    * max per user. */
  def streamingRetention(days: Dataset[DayEvent]): Dataset[RetentionState] = {
    val spark = days.sparkSession
    import spark.implicits._
    days
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[DayEvent],
            state: GroupState[RetentionState]) =>
          var st = state.getOption
            .getOrElse(RetentionState(user, -1L, 0L))
          for (e <- it.toSeq.sortBy(_.day_us)) {
            if (st.cohort_us < 0) st = st.copy(cohort_us = e.day_us)
            val off = (e.day_us - st.cohort_us) / DayUs
            require(off >= 0 && off < 63,
              s"retention offset $off outside the 63-day bitmap window")
            st = st.copy(offsets = st.offsets | (1L << off))
          }
          state.update(st)
          st
      }
  }

  /** [[streamingRetention]] for programs longer than one bitmap: the
    * per-user state shards the active-offset bitmap into `blockDays`-day
    * BLOCKS — (cohort, [(block_id, bitmap)]) rows, still O(window) per
    * user (one Long per touched block), never O(events). Every (user,
    * block) bitmap is MONOTONE (bits only turn on; bit 63 never used
    * since blockDays ≤ 63), and the emitted per-block rows carry the
    * fixed cohort, so an Update-mode sink collapses to the final state
    * with a plain max per (user, block). Offsets before the cohort day
    * raise (ts-monotone arrival is the contract, as in the one-bitmap
    * form); offsets past day 62 land in later blocks instead of
    * raising — the point of the shard. */
  def streamingRetentionSharded(days: Dataset[DayEvent],
      blockDays: Int = 63): Dataset[RetentionBlock] = {
    require(blockDays >= 1 && blockDays <= 63,
      s"blockDays must fit a 63-bit bitmap, got $blockDays")
    val spark = days.sparkSession
    import spark.implicits._
    days
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[DayEvent],
            state: GroupState[RetentionBlocks]) =>
          var st = state.getOption
            .getOrElse(RetentionBlocks(user, -1L, Seq.empty, Seq.empty))
          val blocks = scala.collection.mutable.LinkedHashMap(
            st.block_ids.zip(st.bitmaps): _*)
          for (e <- it.toSeq.sortBy(_.day_us)) {
            if (st.cohort_us < 0) st = st.copy(cohort_us = e.day_us)
            val off = (e.day_us - st.cohort_us) / DayUs
            require(off >= 0,
              s"retention offset $off precedes the cohort day — batches " +
                "must arrive ts-monotone")
            val block = (off / blockDays).toInt
            blocks(block) = blocks.getOrElse(block, 0L) |
              (1L << (off % blockDays).toInt)
          }
          st = st.copy(block_ids = blocks.keys.toSeq,
            bitmaps = blocks.values.toSeq)
          state.update(st)
          blocks.iterator.map { case (b, bm) =>
            RetentionBlock(user, st.cohort_us, b, bm)
          }
      }
  }

  /** The SAME running counters on Spark 4's `transformWithState` — the
    * arbitrary-stateful-processing API that replaces mapGroupsWithState
    * going forward: typed state handles (ValueState/ListState/MapState)
    * acquired per-key from the processor handle, optional per-state TTL,
    * timers instead of a single timeout, and a RocksDB-backed store
    * required underneath (state no longer needs to fit a JVM heap — the
    * 100 TB-keys deployment path). Semantics here are kept bit-identical
    * to [[runningUserStats]] so the s14 row can share s06's oracle: same
    * deterministic in-batch ordering, same floor-tick accumulation. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserRunning] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[UserRunning] = _
    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[UserRunning]("running",
        org.apache.spark.sql.Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(
        user: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserRunning] = {
      val prev =
        if (state.exists()) state.get() else UserRunning(user, 0L, 0.0, "")
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val next = evs.foldLeft(prev) { (acc, e) =>
        UserRunning(user, acc.n_events + 1,
          acc.total_value + math.floor(e.value * 1000) / 1000,
          e.event_type)
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserStatsTws(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, closed: Boolean)
  /** Internal keyed state for [[customSessions]] (public: Catalyst codegen
    * instantiates it reflectively when encoding state). */
  case class SessionState(start: Long, end: Long, n: Long)

  /** Custom sessionization via `flatMapGroupsWithState` (the other keyed
    * custom-state surface from the brief, complementing
    * [[runningUserStats]]'s mapGroupsWithState): per-user sessions split on
    * `gapMs` of event-time silence. Events extend the open session or close
    * it and start the next; a closed session is emitted the moment the gap
    * is observed (flatMap: 0..n outputs per group per batch — exactly what
    * mapGroupsWithState cannot express), and event-time timeout emits the
    * final session once the watermark passes the gap horizon, so state
    * stays bounded. Append-mode compatible. */
  def customSessions(
      events: Dataset[UserEvent],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed the gap horizon: flush the open session
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, closed = true))
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closedOut = Seq.newBuilder[SessionOut]
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  // within-watermark out-of-order events merge symmetrically:
                  // an event before the open session's start widens the start
                  // just as a later one widens the end, so emitted bounds are
                  // event-time min/max of the absorbed events. Cross-batch
                  // session SPLITTING is arrival-order: whether two events gap
                  // apart land in one session depends on what arrived between
                  // them — the bounded-state trade-off (a full event-time sort
                  // would require unbounded buffering).
                  open = Some(SessionState(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closedOut += SessionOut(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, closed = true)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closedOut.result().iterator
          }
      }
  }

  /** Stream-stream interval join — the remaining Structured Streaming join
    * surface: every click paired with the same user's views in the
    * `lookback` window before it. Watermarks on BOTH sides plus the time
    * bound in the join condition are what let Spark evict join state: a
    * buffered view can be dropped once the click-side watermark passes
    * view_ts + lookback. Works identically on batch frames (the specs'
    * golden path). One shuffle per side on user_id. */
  def clickViewJoin(
      events: DataFrame,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("click_user") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"))
      .select(col("click_user").as("user_id"), col("click_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Streaming exact dedup across micro-batches — the streaming face of
    * Dedup.exactDedup: duplicates arriving while their event time is within
    * the watermark horizon are dropped; state older than the watermark is
    * evicted, so state is bounded (late duplicates beyond the horizon pass
    * through — the trade-off every bounded-state streaming dedup makes).
    *
    * Two state-key modes:
    *  - default (digest): a 128-bit composite of two independently-salted
    *    xxhash64 halves of the payload — 16 bytes of state per event
    *    regardless of payload width. A collision silently drops a distinct
    *    event, but at 128 bits the birthday bound is ~2⁶⁴ events per
    *    watermark horizon (the earlier single-64-bit digest crossed
    *    non-negligible collision odds at billions of events).
    *  - `exact = true`: state keys are the payload columns themselves —
    *    zero collision risk, state size proportional to payload width.
    *    Use for narrow payloads or when any silent drop is unacceptable. */
  def streamingDedup(
      events: DataFrame, tsCol: String, payloadCols: Seq[String],
      watermark: String = "1 hour", exact: Boolean = false): DataFrame =
    if (exact)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(payloadCols)
    else
      // prepending a distinct constant reseeds xxhash64's running state, so
      // the two halves behave as independently-drawn 64-bit hash functions
      streamingDedupByKeys(events, tsCol, Seq(
        xxhash64(payloadCols.map(col): _*),
        xxhash64(lit(0x9E3779B97F4A7C15L) +: payloadCols.map(col): _*)), watermark)

  /** Dedup on explicit state-key expressions — the mechanism behind the
    * digest mode, exposed package-private so tests can force key collisions
    * (infeasible to construct against real xxhash64) and prove the
    * drop-on-collision / survive-on-exact behaviors. */
  private[graft] def streamingDedupByKeys(
      events: DataFrame, tsCol: String, keys: Seq[Column],
      watermark: String): DataFrame = {
    val names = keys.indices.map(i => s"__dedup_key_$i")
    val keyed = names.zip(keys).foldLeft(events.withWatermark(tsCol, watermark)) {
      case (df, (n, k)) => df.withColumn(n, k)
    }
    keyed.dropDuplicatesWithinWatermark(names).drop(names: _*)
  }

  /** Streaming ingestion into a deterministic sharded parquet layout
    * ([[graft.sources.Sinks.writeSharded]]) via `foreachBatch` incremental
    * upsert: each micro-batch rewrites ONLY the shard directories its rows
    * touch, so steady-state ingest cost tracks batch size, not corpus
    * size. Because shard assignment and within-shard order are pure row
    * functions, a REPLAYED micro-batch (failure recovery) rewrites the
    * same shards with identical content — the sink is idempotent, which
    * upgrades foreachBatch's at-least-once replay to effectively
    * exactly-once layout state. Batch 0 bootstraps the layout through the
    * same code path. */
  def ingestSharded(
      stream: DataFrame, path: String, idCol: String, nShards: Int,
      checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sinks.upsertSharded(
          batch.sparkSession, path, batch, idCol, nShards)
      }
      .start()

  /** Stream-stream LEFT OUTER click→view join: every click emits — joined
    * to each qualifying view, or null-extended if none arrives. The outer
    * (null) row for a click can only emit once the watermark passes the
    * click's eviction point (no earlier-timestamped view can still
    * arrive), so unmatched clicks inside the final watermark horizon stay
    * buffered at stream end — the semantics any bounded-state outer join
    * must have, and what the s07 oracle replicates. Same state shape and
    * eviction as [[clickViewJoin]]. */
  def clickViewLeftJoin(
      events: DataFrame,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("click_user") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"),
        "left_outer")
      .select(col("click_user").as("user_id"), col("click_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Stream-stream FULL OUTER click↔view join — both sides emit: matched
    * pairs inner-style, and each side null-extended once ITS state
    * watermark passes. The eviction points differ per side, derived from
    * the join condition's time bounds: a click (state holds views with
    * `view_ts ≤ click_ts`) evicts when the watermark passes `click_ts`;
    * a view (joinable clicks have `click_ts ≤ view_ts + lookback`)
    * evicts only when the watermark passes `view_ts + lookback`. So at
    * stream end, unmatched clicks inside the final 1 h horizon and
    * unmatched views inside the final 1 h + lookback horizon stay
    * buffered and never emit — exactly what the s16 oracle replicates
    * with per-side horizons. Completes the streaming join-mode matrix
    * (inner s05, left-outer s07, full-outer s16). */
  def clickViewFullJoin(
      events: DataFrame,
      lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("click_user") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"),
        "full_outer")
      .select(col("click_id"), col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Streaming materialized-view maintenance: foreachBatch merges each
    * micro-batch into the [[graft.operators.IncrementalAgg]] state. Unlike
    * [[ingestSharded]]'s upsert (naturally idempotent), an aggregate MERGE
    * double-counts under foreachBatch's at-least-once replay — so each
    * batch commits an atomically-renamed state VERSION keyed by batchId
    * ([[graft.operators.IncrementalAgg.refreshOnce]]): a replayed id
    * either sees its committed snapshot (skip) or recomputes from the
    * previous complete one, making the merge exactly-once even across a
    * crash mid-write (single-writer only, like any checkpointed sink). */
  def aggMaintain(
      stream: DataFrame, statePath: String, keyCol: String, valueCol: String,
      checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatchOnce(batch, statePath, keyCol, valueCol, batchId)
      }
      .start()

  /** The [[aggMaintain]] batch body: exactly-once versioned merge. */
  def mergeBatchOnce(
      batch: DataFrame, statePath: String, keyCol: String, valueCol: String,
      batchId: Long): Unit =
    graft.operators.IncrementalAgg.refreshOnce(
      batch.sparkSession, statePath, batch, keyCol, valueCol, batchId)

  /** [[aggMaintain]] generalized to a SERVABLE materialized view: each
    * micro-batch rolls up with `rollup` and merges into the persisted MV
    * via [[graft.operators.MvMaintain.merge]] under the same exactly-once
    * versioned commit, so at every instant the committed snapshot equals
    * the MV rebuilt over everything ingested (MvSpec's equivalence) AND
    * is an immutable parquet dir [[graft.plans.MvRewrite.register]] can
    * serve join-back rewrites from between batches. `onRefresh(batchId)`
    * fires after each commit — the hook where a serving layer re-points
    * the registered MV at the new version
    * ([[graft.operators.IncrementalAgg.latestStateDir]]). */
  def mvMaintain(
      stream: DataFrame, statePath: String, keys: Seq[String],
      rollup: DataFrame => DataFrame, rollups: Map[String, String],
      checkpoint: String, onRefresh: Long => Unit = _ => ()) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.IncrementalAgg.refreshOnceWith(
          batch.sparkSession, statePath, rollup(batch), batchId,
          (st, dl) => graft.operators.MvMaintain.merge(st, dl, keys, rollups))
        onRefresh(batchId)
      }
      .start()

  /** Streaming BINARY ROUTING: every micro-batch row goes to exactly one
    * of two parquet sinks by a row-local predicate — the
    * curation-pipeline shape where a batch-trained model (d51 weights, a
    * bloom, a rule set) scores a document stream and routes keep/reject.
    * The batch materializes ONCE (localCheckpoint) so the two filtered
    * writes don't recompute the source; each write lands in a
    * `batch=<id>` subdir with overwrite, so an at-least-once replay
    * rewrites the same directory — idempotent without any marker
    * protocol, and a crash mid-batch leaves a partial dir the replay
    * overwrites. Readers see `keepDir`/`rejectDir` as ordinary
    * batch-partitioned parquet tables. */
  def routeBinary(
      stream: DataFrame, keep: org.apache.spark.sql.Column,
      keepDir: String, rejectDir: String, checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a NULL-evaluating predicate (e.g. a null-scoring feature) would
        // satisfy neither filter(__keep) nor filter(!__keep) and vanish
        // from BOTH sinks — coalesce pins null to the reject side so the
        // contract ("every row lands in exactly one sink") holds
        val b = batch.withColumn("__keep", coalesce(keep, lit(false)))
          .localCheckpoint()
        try {
          b.filter(col("__keep")).drop("__keep")
            .write.mode("overwrite").parquet(s"$keepDir/batch=$batchId")
          b.filter(!col("__keep")).drop("__keep")
            .write.mode("overwrite").parquet(s"$rejectDir/batch=$batchId")
        } finally graft.operators.Dedup.release(b)
      }
      .start()

  /** Streaming STATELESS TRANSFORM ingestion — the "compute signals at
    * ingest" shape (RedPajama-V2 ships its quality-signals table this
    * way): each micro-batch maps through a row-local transform `f` and
    * lands in an idempotent per-`batch=<id>` overwrite dir, so an
    * at-least-once replay rewrites the same directory and readers see
    * one batch-partitioned parquet table. No state, no marker protocol —
    * exactly-once falls out of idempotence. Because `f` is per-row, the
    * streamed union over batches EQUALS the batch `f` of the full corpus
    * — the s23 oracle equivalence. */
  def transformIngest(
      stream: DataFrame, f: DataFrame => DataFrame,
      outDir: String, checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        f(batch).write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Streaming benchmark-decontamination gate — [[routeBinary]]'s
    * two-sink contract for a predicate that needs a JOIN, not a column:
    * each micro-batch's docs are scored against a once-prepped benchmark
    * ([[graft.operators.Contamination.prepBenchmark]] — Bloom bytes +
    * distinct shingle frame computed before the stream starts, so no
    * per-trigger benchmark scan), and rows route to keep/reject by
    * contamination threshold via the same idempotent per-`batch=<id>`
    * overwrite dirs (at-least-once replay rewrites identically).
    * Scoring is stateless per doc, so the streamed keep union equals the
    * batch [[graft.operators.Contamination.decontaminate]] of the same
    * corpus — the s22 oracle equivalence. */
  def decontamGate(
      stream: DataFrame, bench: DataFrame, bloomBytes: Array[Byte],
      idCol: String, textCol: String, keepDir: String, rejectDir: String,
      checkpoint: String, threshold: Double = 0.5,
      shingleN: Int = 3) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint()
        try {
          val flagged = graft.operators.Contamination
            .contaminationScoresPrepped(b, bench, bloomBytes,
              idCol, textCol, shingleN)
            .filter(col("contamination") >= threshold)
            .select(col("doc_id").as(idCol))
          b.join(flagged, Seq(idCol), "left_anti")
            .write.mode("overwrite").parquet(s"$keepDir/batch=$batchId")
          b.join(flagged, Seq(idCol), "left_semi")
            .write.mode("overwrite").parquet(s"$rejectDir/batch=$batchId")
        } finally graft.operators.Dedup.release(b)
      }
      .start()

  /** Streaming KLL-sketch maintenance: each micro-batch's per-key quantile
    * sketches are unioned into a persisted sketch table
    * ([[graft.operators.IncrementalAgg.sketchRefresh]]), so the online
    * profile ("p50/p99 per event type, so far") is always answerable from
    * the ~KB state without replaying the stream. Same exactly-once
    * versioned-commit pattern as [[aggMaintain]] — essential here, since
    * sketch union is NOT idempotent (a double merge inflates weights
    * permanently, unlike s08's keyed upsert). */
  def sketchMaintain(
      stream: DataFrame, statePath: String, keyCol: String, valueCol: String,
      checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sketchBatchOnce(batch, statePath, keyCol, valueCol, batchId)
      }
      .start()

  /** The [[sketchMaintain]] batch body: exactly-once versioned union. */
  def sketchBatchOnce(
      batch: DataFrame, statePath: String, keyCol: String, valueCol: String,
      batchId: Long): Unit =
    graft.operators.IncrementalAgg.sketchRefreshOnce(
      batch.sparkSession, statePath, batch, keyCol, valueCol, batchId)

  /** Streaming heavy-hitter maintenance: the [[sketchMaintain]] pattern
    * with frequent-items sketches ([[graft.operators.IncrementalAgg
    * .freqRefresh]]) — "which terms/users dominate the stream, so far"
    * answerable at any moment from ≤ maxMapSize counters per key. */
  def freqMaintain(
      stream: DataFrame, statePath: String, keyCol: String, termCol: String,
      maxMapSize: Int, checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        freqBatchOnce(batch, statePath, keyCol, termCol, maxMapSize, batchId)
      }
      .start()

  /** The [[freqMaintain]] batch body: exactly-once versioned union. */
  def freqBatchOnce(
      batch: DataFrame, statePath: String, keyCol: String, termCol: String,
      maxMapSize: Int, batchId: Long): Unit =
    graft.operators.IncrementalAgg.freqRefreshOnce(
      batch.sparkSession, statePath, batch, keyCol, termCol, maxMapSize,
      batchId)

  /** Wire a streaming DataFrame through to a named in-memory sink; returns
    * the query (caller awaits/process-all). Update mode suits aggregations. */
  def toMemorySink(df: DataFrame, name: String, complete: Boolean = true) =
    toMemorySinkMode(df, name,
      if (complete) OutputMode.Complete else OutputMode.Update)

  /** [[toMemorySink]] with an explicit output mode (append-only sinks such
    * as flatMapGroupsWithState reject Update). */
  def toMemorySinkMode(df: DataFrame, name: String, mode: OutputMode) =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
}
