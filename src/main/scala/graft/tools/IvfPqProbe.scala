package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure e10 IVF-PQ recall@5 (raw number, not the gate boolean) per SF —
  * used to place the gate floor with evidence. Not part of any gate. */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val probes = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val coarse = Similarity.kmeansCentroidsCollected(
        emb, "vec_id", "embedding", k = 16, iters = 3, seed = 42L)
      val pq = Similarity.pqTrainNormalizedCollected(emb, "vec_id", "embedding")
      val index = Similarity.ivfPqBuildIndex(
        Similarity.centroidsDF(spark, coarse),
        Similarity.pqCodebookDF(spark, pq), emb, "vec_id", "embedding")
      val ivfpq = Similarity.ivfPqTopKFromIndex(
          Similarity.centroidsDF(spark, coarse),
          Similarity.pqCodebookDF(spark, pq),
          index, emb, probes, "vec_id", "embedding", k = 5, nProbe = 6)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_ivfpq"))
      val bf = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
      val r = ivfpq.join(bf, Seq("probe_id", "neighbor_id"), "full_outer")
        .agg(
          (sum(col("in_ivfpq")) === count(col("in_bf"))).as("complete"),
          (count(when(col("in_ivfpq") === 1 && col("in_bf") === 1, 1)).cast("double") /
            count(col("in_bf"))).as("recall"))
        .head()
      println(s"$d complete=${r.getBoolean(0)} recall@5=${r.getDouble(1)}")
    }
    spark.stop()
  }
}
