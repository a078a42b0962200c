package graft.tools
import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val cents = Similarity.kmeansCentroidsCollected(emb, "vec_id", "embedding", 16, 3, 42L)
      val c = Similarity.ivfRecallCurve(Similarity.centroidsDF(s, cents), emb, probes,
        "vec_id", "embedding", 5, Seq(1, 2, 4, 8, 16)).orderBy("n_probe").collect()
      println(d + " -> " + c.map(r => s"${r.getInt(0)}:${"%.2f".format(r.getDouble(1))}").mkString(" "))
      // round-15: the e25 shortlist curves (half probe density, k=5)
      val p2 = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
      val n = emb.count().toInt
      val lists = Seq(math.max(8, n / 50), math.max(100, n / 5), n).distinct.sorted
      def fmt(df: org.apache.spark.sql.DataFrame) = df.orderBy("shortlist")
        .collect().map(r => s"${r.getInt(0)}:${"%.3f".format(r.getDouble(1))}").mkString(" ")
      println(d + " JL -> " + fmt(Similarity.jlRecallCurve(
        emb, p2, "vec_id", "embedding", 5, lists)))
      println(d + " PQ -> " + fmt(Similarity.pqShortlistRecallCurve(
        emb, p2, "vec_id", "embedding", 5, lists)))
    }
    s.stop()
  }
}
