package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Throwaway cross-check main used while iterating (not part of any gate). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    args.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.show(30, false)
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
