package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc profiling for near-dup cluster collapse. */
object ProfD09 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }
    time("warmup")(docs.count())
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.8)
      .select(col("id_a"), col("id_b")).persist()
    time("pairs")(pairs.count())
    time("cc")(Dedup.connectedComponents(pairs).count())
    time("cc again")(Dedup.connectedComponents(pairs).count())
    spark.stop()
  }
}
