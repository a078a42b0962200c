package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage census of one SparkEntry query: prints every completed
  * stage's task count, total executor run time, and max single-task
  * time — the straggler/serial-stage detector (guide §7.1 in tool
  * form: a stage whose maxTaskMs ≈ sumTaskMs is a serial stage).
  * Usage: run_main.sh graft.tools.StageCensus <query> [sfDir] */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null)
            taskMax.merge(e.stageId, e.taskMetrics.executorRunTime, math.max(_, _))
          ()
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          rows.add((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime,
            taskMax.getOrDefault(si.stageId, 0L),
            si.name.takeWhile(_ != '\n').take(80)))
          ()
        }
      })
    // warmup
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    rows.clear()
    System.gc(); Thread.sleep(200)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[census] $name total=$dt%.3f s")
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(-_._3)
    val sumAll = all.map(_._3).sum
    println(s"[census] stages=${all.size} sumTaskMs=$sumAll")
    all.take(20).foreach { case (id, n, sum, mx, nm) =>
      println(f"[census] stage=$id%-5d tasks=$n%-4d sumMs=$sum%-7d maxTaskMs=$mx%-7d $nm")
    }
    spark.stop()
  }
}
