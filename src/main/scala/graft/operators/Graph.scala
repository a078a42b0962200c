package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge DataFrames.
  *
  * Scale shape: one iteration of PageRank is one key-partitioned shuffle
  * (contributions grouped by destination, partial-aggregating — a
  * celebrity vertex's in-flow arrives as per-partition partials) plus a
  * broadcast-or-shuffle join of the rank vector against the edge list.
  * The edge list, degrees, and vertex set are checkpointed ONCE and
  * reused across iterations; each iteration's rank vector is
  * checkpointed eagerly and the previous one released, so the plan stays
  * iteration-sized instead of growing a k-join lineage.
  */
object Graph {

  /** PageRank in exact fixed-point integer arithmetic — every engine (and
    * the DuckDB oracle) reproduces it bit-for-bit because the only
    * operations are Long sums and floor divisions (no float mass):
    *
    *   r₀(v)    = initFp                        (10⁹ ≙ 1.0)
    *   rₜ₊₁(v)  = teleportFp
    *              + (Σ_{u→v} (rₜ(u) div outdeg(u))) · dampNum div dampDen
    *
    * with teleportFp = (1−d)·10⁹ and dampNum/dampDen = d. The fixed-point
    * floor in each term loses < 1 ulp of mass per hop — deterministic,
    * and irrelevant to ranking at 10⁹ scale. Dangling vertices (out-degree
    * 0) receive teleport mass only and contribute none, the standard
    * pruned-dangling convention; vertices are the UNION of both endpoint
    * sets so sinks still get ranked. Returns (vertex, rank_fp). */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      teleportFp: Long = 150000000L, initFp: Long = 1000000000L)
      : DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
      .localCheckpoint(true)
    var ranks = verts.select(col("v"), lit(initFp).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("r div od").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      val next = verts.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(teleportFp) +
            expr(s"(coalesce(s, cast(0 as bigint)) * $dampNum)" +
              s" div $dampDen")).as("r"))
        .localCheckpoint(true)
      Dedup.release(ranks)
      ranks = next
    }
    // the final vector is a self-contained checkpoint — the shared
    // frames it was built from can be freed now
    Seq(e, deg, verts).foreach(Dedup.release)
    ranks.select(col("v").as("vertex"), col("r").as("rank_fp"))
  }
}
