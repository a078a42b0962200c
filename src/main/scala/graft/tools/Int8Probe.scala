package graft.tools
import graft.Tables
import graft.operators.{Quantize, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off: measured int8-serving recall vs fp32 exact (e13 context). */
object Int8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val codes = Quantize.int8Codes(emb, "vec_id", "embedding")
      val pc = codes.filter(pmod(col("vec_id"), lit(50)) === 0)
      val q = Similarity.int8TopK(codes, pc, "vec_id", "codes", 5)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_q"))
      val probes = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val bf = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
      val r = q.join(bf, Seq("probe_id", "neighbor_id"), "full_outer")
        .agg((count(when(col("in_q") === 1 && col("in_bf") === 1, 1)).cast("double") /
          count(col("in_bf"))).as("recall")).collect()(0).getDouble(0)
      println(f"$sf recall@5 = $r%.4f")
    }
    spark.stop()
  }
}
