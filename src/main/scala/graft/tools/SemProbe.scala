package graft.tools
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = graft.Tables.embeddings(spark, d).select("vec_id", "embedding")
      val clones = emb.filter(pmod(col("vec_id"), lit(40)) === 7)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + lit(0.05) * sin(col("vec_id").cast("double") + i.cast("double")))
              .cast("float")).as("embedding"))
      val corpus = emb.unionAll(clones)
      val cents = Similarity.centroidsDF(spark,
        Similarity.kmeansCentroidsCollected(emb, "vec_id", "embedding", 16, 3, 42L))
      val tau = 0.95
      val sem = Dedup.semDedupPairs(corpus, "vec_id", "embedding", cents, tau)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Dedup.embeddingNearDupsExact(corpus, "vec_id", "embedding", tau)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = clones.select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = if (exact.isEmpty) 1.0 else (sem & exact).size.toDouble / exact.size
      val exactIsPlanted = exact.forall { case (a, b) => b - a == 1000000L } && exact.size == planted.size
      println(s"$sf n_planted=${planted.size} exact=${exact.size} exact_is_planted=$exactIsPlanted sem=${sem.size} precision_ok=${sem.subsetOf(exact)} recall=$recall")
    }
    spark.stop()
  }
}
