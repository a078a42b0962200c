package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spill-path proof: every agg/join row normally runs inside a roomy
  * 128 GiB heap, but a 100 TB deployment WILL exceed executor memory and
  * live or die on Spark's spill path (ExternalAppendOnlyUnsafeRowArray,
  * UnsafeExternalSorter, spillable aggregation maps). This probe runs the
  * shuffle-heaviest rows twice in one JVM — first under a normal session
  * for a reference digest, then under a deliberately starved execution
  * pool (`spark.memory.fraction` floor, default 0.05 ≈ a few MB of
  * execution memory per task at 32 threads) with a TaskEnd listener
  * summing memory/disk spill bytes — and asserts:
  *
  *   1. results are HASH-IDENTICAL under starvation (an order-independent
  *      sum of per-row md5 digests — spilling must never change answers);
  *   2. the starved run actually spilled (nonzero bytes — otherwise the
  *      "proof" exercised nothing).
  *
  * Run against the 10× tiled dir (ScaleSmoke.ensureData) so per-task
  * state comfortably exceeds the starved pool.
  *
  * Usage: SPARK_DRIVER_MEM=4g scripts/run_main.sh graft.tools.SpillProbe
  *        [memoryFraction] [queries...]
  */
object SpillProbe {

  private val DEFAULT = Seq("d05_exact_dedup", "d28_canonical_dedup",
    "q75_tpch_q9", "q90_bucketed_join", "d35_dupspan")

  /** Order-independent digest: sum of 60-bit md5 prefixes of each row's
    * JSON. Identical plans under both sessions → comparable bytes. */
  private def digest(df: DataFrame): Long =
    df.select(conv(substring(md5(to_json(struct(
        df.columns.map(col).toIndexedSeq: _*))), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(sum(col("h"))).head.getLong(0)

  private def session(memoryFraction: Option[Double]): SparkSession = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "900s")
    memoryFraction.foreach { f =>
      b.config("spark.memory.fraction", f.toString)
        // starve storage too: unified memory lets execution borrow idle
        // storage; capping the storage share keeps the squeeze honest
        .config("spark.memory.storageFraction", "0.1")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val frac = args.headOption.flatMap(_.toDoubleOption).getOrElse(0.05)
    val names0 = if (args.exists(a => a.toDoubleOption.isEmpty))
      args.filter(_.toDoubleOption.isEmpty).toSeq else DEFAULT
    val names = names0
    val dst = "/tmp/graft_sf1"

    // pass 1: reference digests under a normal session (also tiles data)
    val ref = session(None)
    ScaleSmoke.ensureData(ref)
    ScaleSmoke.ensureRelationalTiles(ref)
    val refDigests = names.map { n =>
      if (SparkEntry.setupQueries.contains(n))
        SparkEntry.queries(n)(ref, dst).count()
      val df = SparkEntry.queries(n)(ref, dst)
      n -> ((digest(df), df.count()))
    }.toMap
    ref.stop()
    // a fresh context must not resurrect the previous default session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // pass 2: starved session + spill accounting
    val starved = session(Some(frac))
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    starved.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled); ()
        }
      }
    })
    println(f"${"query"}%-22s ${"wall_s"}%7s ${"spill_mem_MB"}%13s ${"spill_disk_MB"}%14s ${"rows"}%9s  match")
    var bad = 0
    names.foreach { n =>
      if (SparkEntry.setupQueries.contains(n))
        SparkEntry.queries(n)(starved, dst).count()
      System.gc(); Thread.sleep(200)
      val m0 = memSpill.get(); val d0 = diskSpill.get()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(starved, dst)
      val dg = digest(df)
      val rows = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events drain asynchronously
      val sm = (memSpill.get() - m0) / 1e6
      val sd = (diskSpill.get() - d0) / 1e6
      val ok = refDigests(n) == ((dg, rows))
      if (!ok) bad += 1
      if (sm + sd == 0) {
        println(s"[spill] WARNING: $n did not spill at fraction=$frac")
        bad += 1
      }
      println(f"$n%-22s $wall%7.2f $sm%13.1f $sd%14.1f $rows%9d  $ok")
    }
    starved.stop()
    if (bad > 0) { System.err.println(s"[spill] $bad failures"); sys.exit(1) }
  }
}
