package graft.tools

import graft.queries.StreamQueries
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-state scaling probe: runs the s04 sessionization kernel
  * (flatMapGroupsWithState, event-time timeout) at sf0.1 and the 10×
  * tiled sf1 (10× the user-key space — ScaleSmoke.ensureData must have
  * run), under either state store provider, and reports per-run wall
  * time plus the state operator's peak row count and memory from the
  * query's progress metrics. This turns the RocksDB-vs-heap deployment
  * guidance into a measured table (PLANS.md).
  *
  * Usage: scripts/run_main.sh graft.tools.StateProbe [heap|rocksdb] [sessions|tws]
  * (`tws` runs the s14 transformWithState counters instead — RocksDB only,
  * the API requires it.)
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val provider = args.headOption.getOrElse("heap")
    val kernel = args.drop(1).headOption.getOrElse("sessions")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      StreamQueries.prestage(d)
      val ev = StreamQueries.eventsStreamFor(spark, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[EventStreams.UserEvent]
      val (streamDf, mode) =
        if (kernel == "tws")
          (EventStreams.runningUserStatsTws(ev).toDF(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        else
          (EventStreams.customSessions(ev,
            gapMs = 30L * 60 * 1000, watermark = "1 hour").toDF(),
            org.apache.spark.sql.streaming.OutputMode.Append())
      val name = s"state_probe_${provider}_${kernel}_${Integer.toHexString(d.hashCode)}"
      val t0 = System.nanoTime()
      val q = EventStreams.toMemorySinkMode(streamDf, name, mode)
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val sos = q.recentProgress.flatMap(_.stateOperators)
      val peakRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
      val peakMem = if (sos.isEmpty) 0L else sos.map(_.memoryUsedBytes).max
      val emitted = spark.table(name).count()
      println(f"[state] provider=$provider%-7s dir=$d%-25s wall=$wall%6.2f s " +
        f"peakStateRows=$peakRows%8d peakStateMem=${peakMem / 1024.0 / 1024.0}%8.1f MiB " +
        f"sessions=$emitted%8d")
      spark.catalog.dropTempView(name)
    }
    spark.stop()
  }
}
