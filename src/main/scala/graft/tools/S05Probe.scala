package graft
import org.apache.spark.sql.SparkSession
object S05Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (np <- Seq("32", "8", "4"); round <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", np)
      val t0 = System.nanoTime()
      SparkEntry.queries("s05_stream_join")(spark, d).count()
      println(f"[probe] np=$np round$round ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
