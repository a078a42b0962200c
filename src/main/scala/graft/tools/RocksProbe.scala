package graft
import org.apache.spark.sql.SparkSession
object RocksProbe {
  def main(args: Array[String]): Unit = {
    val provider = args.headOption.getOrElse("hdfs")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      graft.queries.StreamQueries.prestage(d)
      val t0 = System.nanoTime()
      SparkEntry.queries("s03_stream_dedup")(spark, d).count()
      println(f"[rocks] provider=$provider d=$d ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
