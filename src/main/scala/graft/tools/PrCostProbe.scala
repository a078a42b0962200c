package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q111's time go? Runs pageRankFixedPoint at iters =
  * 1,2,4,8 over the real q111 edges at the bench SF and prints wall
  * times — slope = marginal per-iteration cost, intercept = setup
  * (edge derivation + base checkpoints). */
object PrCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "900s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges = {
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
    }
    // JIT/codegen warm
    graft.operators.Graph.pageRankFixedPoint(edges, "src", "dst", 2).count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          { jobs.incrementAndGet(); () }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          ()
        }
      })
    for (iters <- Seq(1, 8); rep <- 1 to 2) {
      System.gc(); Thread.sleep(150)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      graft.operators.Graph.pageRankFixedPoint(edges, "src", "dst", iters).count()
      println(f"[prcost] iters=$iters rep=$rep ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        s"taskTimeMs=${taskMs.get}")
    }
    spark.stop()
  }
}
