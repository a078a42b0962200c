package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the e27 chunk-IVF recall curve (raw recalls per nProbe) at the
  * given SF dirs — the measurement behind the e27 row's mid-budget floor. */
object ChunkIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (d <- args) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val queries = docs.filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val index = Similarity.chunkIndex(corpus, "doc_id", "text")
        .localCheckpoint(true)
      val cents = Similarity.chunkIvfCentroidsCollected(index,
        nCells = 8, iters = 2, seed = 42L)
      val ivf = Similarity.chunkIvfIndex(index, cents).localCheckpoint(true)
      println(s"===== $d (chunks=${ivf.count()}, queries=${queries.count()})")
      Similarity.chunkIvfRecallCurve(ivf, cents, queries, "doc_id", "text",
        k = 3, Seq(1, 2, 4, 8)).orderBy("n_probe").show()
      // per-cell population (skew check for the pruned serve)
      ivf.groupBy("cell_id").count().orderBy("cell_id").show()
    }
    spark.stop()
  }
}
