package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway cross-check main used while iterating (not part of any gate). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf).filter(col("doc_id") < 300)
      val t0 = System.nanoTime()
      val got = Dedup.fuzzyPairs(docs, "doc_id", "text", maxDist = 6)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      val t1 = System.nanoTime()
      val brute = docs.as("a").crossJoin(docs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          levenshtein(col("a.text"), col("b.text"), 6).as("d"))
        .filter(col("d") >= 0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      println(s"[$sf] got=${got.size} brute=${brute.size} equal=${got == brute} " +
        f"banded=${(t1 - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
