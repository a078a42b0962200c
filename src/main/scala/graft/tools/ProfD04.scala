package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Ad-hoc profiling for the fingerprint-clustering stages. */
object ProfD04 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }
    time("warmup")(docs.count())
    time("words only")(docs.select(TextAnalysis.words(col("text"))).count())
    time("distinct+sort")(docs.select(
      array_sort(array_distinct(TextAnalysis.words(col("text"))))).count())
    time("fingerprintKey")(docs.select(TextAnalysis.fingerprintKey(col("text"))).count())
    time("full d04")(graft.SparkEntry.queries("d04_fingerprint")(spark, d).count())
    time("full d04 again")(graft.SparkEntry.queries("d04_fingerprint")(spark, d).count())
    spark.stop()
  }
}
