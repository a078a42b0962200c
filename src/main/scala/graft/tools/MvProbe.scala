package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object MvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val df = SparkEntry.queries("q91_mv_rewrite")(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val usesMv = plan.contains("graft_mv_")
      val scansBase = plan.contains("lineitem.parq")
      val mvRows = df.collect().toSeq
      // build first (the query function re-registers the rule), THEN strip
      // the rule; optimization is lazy so the base plan optimizes rule-free
      val base = SparkEntry.queries("q91_mv_rewrite")(spark, d)
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        saved.filterNot(_ == graft.plans.MvRewrite)
      val baseUsesBase = base.queryExecution.executedPlan.toString
        .contains("lineitem.parq")
      val same = mvRows == base.collect().toSeq
      spark.experimental.extraOptimizations = saved
      println(s"$sf uses_mv=$usesMv scans_base=$scansBase base_scans_base=$baseUsesBase results_equal=$same rows=${mvRows.size}")
    }
    spark.stop()
  }
}
