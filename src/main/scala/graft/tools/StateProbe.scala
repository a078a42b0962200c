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
  * Usage: scripts/run_main.sh graft.tools.StateProbe [heap|rocksdb] [sessions|tws|fulljoin|restore]
  * (`tws` runs the s14 transformWithState counters instead — RocksDB only,
  * the API requires it. `fulljoin` probes the s16 dual-sided outer-join
  * buffer — the repo's heaviest state holder — at 1× and 100× KEYS: the
  * 100× dir tiles sf0.01's events 100-fold with offset user/event ids, so
  * the key space grows 100× while per-key behavior is unchanged; reported
  * bytes/key should stay ~flat and wall time ~linear in rows. `restore`
  * measures RESTART cost at 100× keys with RocksDB changelog
  * checkpointing on vs off — see [[restoreProbe]].)
  */
object StateProbe {

  /** Build /tmp/graft_ev100: sf0.01's events tiled 100× with disjoint
    * user_id/event_id offsets (100× the join-key space). Events only —
    * the full-join kernel reads nothing else. */
  private def ensure100x(spark: SparkSession): String = {
    val dst = "/tmp/graft_ev100"
    val done = new java.io.File(s"$dst/_DONE")
    if (!done.exists()) {
      new java.io.File(dst).mkdirs()
      val src = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      (0 until 100).map { t =>
        src.withColumn("event_id", col("event_id") + lit(t * 10000000L))
          .withColumn("user_id", col("user_id") + lit(t * 10000000L))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      done.createNewFile()
    }
    dst
  }

  /** `restore` mode: the RESTART-cost lever at 100× keys — RocksDB
    * changelog checkpointing on vs off. Build phase drains most of the
    * 100× events through the s04 sessionization kernel across several
    * micro-batches (checkpointed, no-op foreachBatch sink); then ONE
    * held-out file lands and a NEW query restarts from the checkpoint —
    * the measured wall is provider init + state restore (load the last
    * snapshot, replay changelogs if enabled) + one small batch, identical
    * input either way. With changelog checkpointing OFF every commit
    * uploads a full RocksDB snapshot (restore = load it); ON, commits
    * write cheap per-batch changelogs against periodic snapshots
    * (restore = snapshot + replay) — the trade a 100 TB deployment tunes
    * with `minDeltasForSnapshot`. */
  private def restoreProbe(spark: SparkSession): Unit = {
    val d = ensure100x(spark)
    // list the 100x events part files once; hold out the lexicographically
    // last for the post-restart batch
    val src = new java.io.File(s"$d/events.parquet")
    val parts = src.listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    require(parts.length >= 2, s"need >=2 part files under $src")
    val (build, heldOut) = (parts.init, parts.last)
    def measure(changelog: Boolean): (Double, Double) = {
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      val probeDir = java.nio.file.Files.createTempDirectory("restoreprobe")
      val srcDir = probeDir.resolve("in").toString
      new java.io.File(srcDir).mkdirs()
      val ckpt = probeDir.resolve("ckpt").toString
      build.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(srcDir, f"part_$i%03d.parquet"))
      }
      def run(): Double = {
        // the s16 full-join kernel: watermark-managed dual-sided buffer —
        // the repo's heaviest state, and robust to the arbitrary
        // event-time order of per-file batches (late rows drop at the
        // watermark; a timeout-setting kernel would throw instead)
        val raw = StreamQueries.eventsStreamOver(spark, d, srcDir,
          Map("maxFilesPerTrigger" -> math.max(1, build.length / 6).toString))
        val out = EventStreams.clickViewFullJoin(raw,
          lookback = "30 minutes", watermark = "1 hour")
        val t0 = System.nanoTime()
        val q = out.writeStream
          .option("checkpointLocation", ckpt)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            // must CONSUME every partition or the state stores never
            // commit (STATE_STORE_COMMIT_VALIDATION_FAILED)
            b.count(); ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      val buildWall = run()
      java.nio.file.Files.copy(heldOut.toPath,
        java.nio.file.Paths.get(srcDir, "part_zzz_late.parquet"))
      val restoreWall = run()
      (buildWall, restoreWall)
    }
    // one full warmup sequence first — the initial streaming run in a
    // fresh JVM pays ~5 s of codegen/classloading that would otherwise
    // masquerade as a changelog-mode difference (measured both orders)
    measure(changelog = true)
    for (changelog <- Seq(false, true)) {
      val (buildWall, restoreWall) = measure(changelog)
      println(f"[restore] changelog=$changelog%-5s buildWall=$buildWall%7.2f s " +
        f"restartWall=$restoreWall%6.2f s (restore + 1 small batch)")
    }
  }

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
    if (kernel == "restore") {
      require(provider == "rocksdb", "restore mode compares RocksDB modes")
      restoreProbe(spark); spark.stop(); return
    }
    import spark.implicits._
    val dirs =
      if (kernel == "fulljoin")
        Seq("/root/testdata/sf0.01", ensure100x(spark))
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    for (d <- dirs) {
      StreamQueries.prestage(d)
      val raw = StreamQueries.eventsStreamFor(spark, d)
      val ev = raw
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[EventStreams.UserEvent]
      val (streamDf, mode) =
        if (kernel == "tws")
          (EventStreams.runningUserStatsTws(ev).toDF(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        else if (kernel == "fulljoin")
          (EventStreams.clickViewFullJoin(raw,
            lookback = "30 minutes", watermark = "1 hour"),
            org.apache.spark.sql.streaming.OutputMode.Append())
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
      val bytesPerRow = if (peakRows > 0) peakMem.toDouble / peakRows else 0.0
      println(f"[state] provider=$provider%-7s dir=$d%-25s wall=$wall%6.2f s " +
        f"peakStateRows=$peakRows%8d peakStateMem=${peakMem / 1024.0 / 1024.0}%8.1f MiB " +
        f"bytes/row=$bytesPerRow%7.1f emitted=$emitted%8d")
      spark.catalog.dropTempView(name)
    }
    spark.stop()
  }
}
