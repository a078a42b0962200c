package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures e17's JL two-tier recall@5 vs the exact ranking per SF —
  * the calibration behind the gate floor (e02's process). */
object JlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val emb = Tables.embeddings(spark, d)
      val probes = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val shortlist = math.max(100, (emb.count() / 5).toInt)
      val jl = Similarity.jlTopK(emb, probes, "vec_id", "embedding",
          k = 5, shortlist = shortlist)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_jl"))
      val bf = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
      val r = jl.join(bf, Seq("probe_id", "neighbor_id"), "full_outer")
        .agg((count(when(col("in_jl") === 1 && col("in_bf") === 1, 1))
          .cast("double") / count(col("in_bf"))).as("recall"))
        .collect().head.getDouble(0)
      println(f"[jl] sf$sf shortlist=$shortlist recall@5=$r%.3f")
    }
    spark.stop()
  }
}
