package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val names = args.toSeq
    // warm each once
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    for (round <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[mini] round$round $n ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
