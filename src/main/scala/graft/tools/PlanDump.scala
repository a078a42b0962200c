package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print the executed plan of one SparkEntry query.
  * Usage: run_main.sh graft.tools.PlanDump <name> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    spark.stop()
  }
}
