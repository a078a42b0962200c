package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fine-grained timing of pageRank's setup steps at the bench SF. */
object PrSetupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "900s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prsetup] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      System.gc(); Thread.sleep(150)
      val pairs = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val e = t("e_ckpt")(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true))
      println(s"[prsetup] edge_rows=${e.count()}")
      val ed = t("ed_ckpt")(e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("od")), Seq("src"))
        .localCheckpoint(true))
      val verts = t("verts_ckpt")(e.select(col("src").as("v"))
        .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true))
      println(s"[prsetup] vert_rows=${verts.count()}")
      val ranks = t("ranks0_ckpt")(
        verts.select(col("v"), lit(1000000000L).as("r")).localCheckpoint(true))
      val next = t("iter1")(graft.operators.Graph.iterationPlan(
        ed, ranks, 85L, 100L, 150000000L).localCheckpoint(true))
      println(s"[prsetup] next_rows=${next.count()}")
      println(s"[prsetup] parts e=${e.rdd.getNumPartitions} " +
        s"ed=${ed.rdd.getNumPartitions} verts=${verts.rdd.getNumPartitions} " +
        s"ranks=${ranks.rdd.getNumPartitions} next=${next.rdd.getNumPartitions}")
      Seq(e, ed, verts, ranks, next).foreach(graft.operators.Dedup.release)
    }
    spark.stop()
  }
}
