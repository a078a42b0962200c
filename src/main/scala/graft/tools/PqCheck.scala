package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Ad-hoc: PQ-ADC top-k recall vs brute force at a given SF — sizes the
  * e08 gate threshold before it's frozen into the oracle row. */
object PqCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ksub = if (args.length > 1) args(1).toInt else 16
    val shortlist = if (args.length > 2) args(2).toInt else 100
    val iters = if (args.length > 3) args(3).toInt else 2
    val emb = graft.Tables.embeddings(spark, d)
    val probes = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val pq = pairs(Similarity.pqTopK(emb, probes, "vec_id", "embedding",
      k = 5, ksub = ksub, shortlist = shortlist, iters = iters))
    val t1 = System.nanoTime()
    val bf = pairs(Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5))
    println(s"pq=${pq.size} bf=${bf.size} overlap=${(pq & bf).size} " +
      f"recall=${(pq & bf).size.toDouble / bf.size}%.3f pq_sec=${(t1 - t0) / 1e9}%.2f")
    spark.stop()
  }
}
