package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Measures whether LIVE streaming rows accumulate cross-query drag in a
  * long suite (round-14: s07/s16/s14 read ~3.5× their isolated steady
  * state in the full bench run). Runs the five heaviest stream rows
  * back-to-back for `rounds` rounds in one JVM and prints per-round
  * times; `--unload` adds a StateStore.stop() boundary after each query
  * (unloads every loaded state-store provider and halts the maintenance
  * task; the next streaming query lazily restarts it), isolating
  * provider accumulation from everything else. */
object StreamDragProbe {
  def main(args: Array[String]): Unit = {
    val unload = args.contains("--unload")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val rows = Seq("s05_stream_join", "s07_stream_left_join",
      "s16_stream_full_join", "s10_stream_session_window",
      "s14_stream_running_tws")
    // compile shapes once at the smallest SF
    rows.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    for (round <- 1 to 4) {
      rows.foreach { n =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[drag] round$round $n%-28s $dt%6.2f s unload=$unload")
        if (unload)
          org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      }
    }
    spark.stop()
  }
}
