package graft.tools

import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Live Structured Streaming demo: rate source shaped into events →
  * windowed event-time aggregation → console sink, a few micro-batches. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(5)).as("user_id"),
        element_at(array(lit("click"), lit("view")),
          (pmod(col("value"), lit(2)) + 1).cast("int")).as("event_type"),
        (col("value") % 100 / 10.0).as("value"))
    val q = EventStreams.windowedCounts(events, "10 seconds", "30 seconds")
      .writeStream.format("console").outputMode("complete")
      .option("truncate", "false").start()
    Thread.sleep(8000)
    q.stop()
    spark.stop()
  }
}
