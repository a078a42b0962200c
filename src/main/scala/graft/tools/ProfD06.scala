package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
/** Ad-hoc profiling harness for the MinHash-LSH pipeline stages. */
object ProfD06 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }
    time("warmup count")(docs.count())
    val hashes = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    time("hashes (persisted)")(hashes.count())
    val sig = hashes.select(col("doc_id"),
      graft.functions.GraftFunctions.minhashSignature(col("sh"), 128, 42L).as("sig")).persist()
    time("signatures")(sig.count())
    val cands = Dedup.minhashCandidatesFromHashes(hashes)
    time("candidates")(cands.count())
    val ver = Dedup.verifyJaccardFromHashes(hashes, cands).filter(col("jaccard") >= 0.8)
    time("verify")(ver.count())
    spark.stop()
  }
}
