package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Where does a streaming row's time go? Attaches a
  * StreamingQueryListener and runs the given s-rows once (after a
  * warmup), printing per-query wall time plus every micro-batch's
  * durationMs breakdown (triggerExecution / queryPlanning / getBatch /
  * addBatch / walCommit / stateStore commit...) and the gap between
  * query start and the first batch — separating fixed start/stop
  * machinery from per-batch work (guide §1/§7).
  * Usage: run_main.sh graft.tools.StreamPhaseProbe s05_stream_join ... */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.cleaner.periodicGC.interval", "900s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    val names = args.toSeq
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit =
          { events.add(s"START ${System.nanoTime()}"); () }
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          events.add(f"BATCH ${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=$dur " +
            s"stateOps=${p.stateOperators.length}")
          ()
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit =
          { events.add(s"END ${System.nanoTime()}"); () }
      })
    // warmup (codegen/JIT at the small SF)
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    for (n <- names; rep <- 1 to 2) {
      events.clear()
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sphase] $n rep=$rep total=$dt%.3f s")
      events.forEach(s => println(s"[sphase]   $s"))
    }
    spark.stop()
  }
}
