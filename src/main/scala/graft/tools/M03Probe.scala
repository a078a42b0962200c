package graft.tools

import graft.Tables
import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object M03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs))
        .toDF().select(col("asset_id"), col("features"))
      // all pairs with cosine >= 0.9 via the exact path
      val hi = Dedup.embeddingNearDupsExact(feats, "asset_id", "features", 0.9)
      val texts = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
      val texts2 = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
      val cls = hi.join(texts, "id_a").join(texts2, "id_b")
        .select(col("cosine"),
          when(col("ta") === col("tb"), "identical")
            .when(col("ta") === concat(col("tb"), lit(" dup")) ||
                  col("tb") === concat(col("ta"), lit(" dup")), "suffix")
            .otherwise("other").as("cls"))
      val agg = cls.groupBy("cls").agg(count(lit(1)).as("n"),
        min("cosine").as("min_cos"), max("cosine").as("max_cos"))
      println(s"== $sf")
      agg.orderBy("cls").collect().foreach(println)
    }
    spark.stop()
  }
}
