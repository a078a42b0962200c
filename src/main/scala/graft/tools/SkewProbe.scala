package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val fact = spark.range(300000).select(
      when(pmod(col("id"), lit(100)) =!= 0, lit(7L))
        .otherwise(pmod(col("id"), lit(50))).as("k"),
      col("id").as("v"))
    val dim = spark.range(50).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = fact.join(dim, Seq("k"))
    val n = joined.toLocalIterator().asScala.length // execute THIS plan
    val plan = joined.queryExecution.executedPlan.toString
    println(s"rows=$n")
    println(plan.linesIterator.filter(l =>
      l.contains("skew") || l.contains("Skew") || l.contains("SortMergeJoin") ||
        l.contains("AQEShuffleRead")).mkString("\n"))
    spark.stop()
  }
}
