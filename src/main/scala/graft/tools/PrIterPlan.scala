package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the r20 PageRank loop-invariant hoist: prints the
  * physical plan of ONE PageRank iteration in both shapes over the real
  * q111 edge frame —
  *   "before": the pre-r20 per-iteration 3-way join
  *             e ⋈ deg ⋈ ranks (degree recomputed+rejoined every round)
  *   "after":  [[graft.operators.Graph.iterationPlan]] — the production
  *             loop body — over the hoisted degree-annotated edge frame
  *             (src, dst, od) checkpointed once before the loop.
  * Usage: run_main.sh graft.tools.PrIterPlan [sfDir]
  * Output: plans/r20/pagerank_iteration_{before,after}.txt (stdout). */
object PrIterPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val pairs = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    // the same checkpointed loop frames pageRankFixedPoint builds
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true)
    val ranks = verts.select(col("v"), lit(1000000000L).as("r"))
      .localCheckpoint(true)
    println("=== BEFORE (pre-r20 iteration: e ⋈ deg ⋈ ranks per round) ===")
    val contribOld = e.join(deg, Seq("src"))
      .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
      .select(col("dst").as("v"), expr("r div od").as("c"))
      .groupBy(col("v")).agg(sum(col("c")).as("s"))
    verts.join(contribOld, Seq("v"), "left")
      .select(col("v"), (lit(150000000L) +
        expr("(coalesce(s, cast(0 as bigint)) * 85) div 100")).as("r"))
      .explain("formatted")
    println("=== AFTER (production loop body: Graph.iterationPlan over" +
      " the hoisted (src, dst, od) frame; zero rows planted from the" +
      " rank vector — r21) ===")
    graft.operators.Graph.iterationPlan(ed, ranks, 85L, 100L,
      150000000L).explain("formatted")
    println("=== AFTER+DELTA (r21 tolFp loop body: previous rank rides" +
      " the planted row; convergence is a scalar agg, no join) ===")
    graft.operators.Graph.iterationPlan(ed, ranks, 85L, 100L,
      150000000L, withDelta = true).explain("formatted")
    spark.stop()
  }
}
