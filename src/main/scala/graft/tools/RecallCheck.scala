package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Ad-hoc: banded SRP-LSH embedding near-dup vs exact all-pairs at a given
  * SF — verifies the e04 recall story on real data, where the DuckDB
  * all-pairs oracle is too slow. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = graft.Tables.embeddings(spark, d)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = pairs(Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.95))
    val exact = pairs(Dedup.embeddingNearDupsExact(emb, "vec_id", "embedding", 0.95))
    println(s"banded=${banded.size} exact=${exact.size} " +
      s"missed=${(exact -- banded).size} spurious=${(banded -- exact).size}")
    spark.stop()
  }
}
