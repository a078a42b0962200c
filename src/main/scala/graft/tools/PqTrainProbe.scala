package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of the PQ training pass (backs the PLANS.md audit of
  * the zero-shuffle training rewrite): times the subvector explode+persist,
  * the windowed init draw, and each baked-argmin round separately, so the
  * 10× smoke ratio can be attributed to the right phase. */
object PqTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.l2normF32

    val m = 8; val ksub = 32; val dim = 64; val sd = dim / m
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      when(l2normF32(col("embedding")) > 0,
        transform(col("embedding"),
          x => (x / l2normF32(col("embedding"))).cast("float")))
        .otherwise(col("embedding")).as("__nv"))
    val sub = corpus.select(col("neighbor_id").as("__vid"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("__nv"), i * sd + 1, lit(sd)))))
      .toDF("__vid", "sub_id", "sv").persist()
    t("explode+persist") { sub.count() }
    import org.apache.spark.sql.expressions.Window
    val wInit = Window.partitionBy(col("sub_id"))
      .orderBy(xxhash64(col("__vid"), lit(42L)), col("__vid"))
    var cents: Seq[(Int, Int, Array[Float])] = t("init window") {
      sub.withColumn("__rn", row_number().over(wInit))
        .filter(col("__rn") <= ksub)
        .select(col("sub_id"), (col("__rn") - 1).cast("int").as("code"), col("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
        .toSeq
    }
    for (i <- 1 to 2) {
      cents = t(s"round $i") {
        val means = Similarity.pqRound(sub, cents)
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
          .toMap
        cents.map { case (s0, c0, old) => (s0, c0, means.getOrElse((s0, c0), old)) }
      }
    }
    if (args.contains("--codegen")) {
      import org.apache.spark.sql.execution.debug._
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Similarity.pqRound(sub, cents).debugCodegen()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // old join+window formulation for comparison
    import graft.functions.GraftFunctions.dotF32
    import spark.implicits._
    def toDF(c: Seq[(Int, Int, Array[Float])]) = c.toDF("sub_id", "code", "centroid")
    for (i <- 1 to 2) {
      t(s"old round $i") {
        val wA = Window.partitionBy(col("__vid"), col("sub_id"))
          .orderBy(col("__d2").asc, col("code").asc)
        sub.join(broadcast(toDF(cents)), "sub_id")
          .withColumn("__d2", pow(l2normF32(col("centroid")), 2) -
            lit(2.0) * dotF32(col("sv"), col("centroid")))
          .withColumn("__rn", row_number().over(wA))
          .filter(col("__rn") === 1)
          .select(col("sub_id"), col("code"), posexplode(col("sv")))
          .groupBy(col("sub_id"), col("code"), col("pos"))
          .agg(avg(col("col").cast("double")).as("m"))
          .groupBy(col("sub_id"), col("code"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).cast("array<float>").as("centroid"))
          .collect()
      }
    }
    sub.unpersist()
    spark.stop()
  }
}
