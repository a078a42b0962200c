package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Bench end-of-suite drag attribution (VERDICT r11 item 3): runs the
  * suite in Bench's order, interleaving the Bench calibration query after
  * every chunk, so the cal-vs-progress curve shows WHERE the ~3.5×
  * cal_last/cal_first drag accumulates (gradual = leak-like growth;
  * step = a specific family). Optional arg 2 toggles mitigation probes:
  *   none      — baseline
  *   unload    — StateStore.unloadAll() + clearCache() at chunk boundaries
  * Usage: scripts/run_main.sh graft.tools.DragProbe [sfDir] [none|unload]
  */
object DragProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mode = args.drop(1).headOption.getOrElse("none")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "900s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cal(): Double = {
      import org.apache.spark.sql.functions.sum
      val t0 = System.nanoTime()
      spark.range(10000000L).agg(sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    cal(); cal()
    val names = SparkEntry.queries.keys.toSeq // same Map order as Bench
    println(f"[drag] start cal=${(1 to 3).map(_ => cal()).min}%.3f")
    names.grouped(15).zipWithIndex.foreach { case (chunk, i) =>
      chunk.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case t: Throwable =>
          System.err.println(s"[drag] $n failed: ${t.getMessage}") }
      }
      if (mode == "unload") {
        org.apache.spark.sql.GraftPlanBridge.unloadStateStores()
        spark.catalog.clearCache()
      }
      System.gc(); Thread.sleep(150)
      val c = (1 to 3).map(_ => cal()).min
      val mem = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1e6
      val threads = Thread.activeCount()
      println(f"[drag] chunk=$i%2d last=${chunk.last}%-28s cal=$c%.3f heapMB=$mem%7.0f threads=$threads%4d")
    }
    spark.stop()
  }
}
