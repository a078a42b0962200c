package graft.queries

import graft.Tables
import graft.api.Context
import graft.functions.TopKLongAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle coverage for the facade/API surface that was previously sbt-only:
  * `lift` (local relations, spear Context.scala:27-30), `rename` (spear
  * LogicalPlan.scala:127-173), `rand` (spear stateful.scala:9-25), and the
  * imperative-aggregate path (spear interfaces.scala:86-126).
  *
  * `rand` values can't match across engines (different generators), so the
  * oracle checks the deterministic contract instead: row count, range
  * [0, 1), and per-row variation. Determinism of rand(seed) across runs is
  * asserted in FacadeSpec.
  */
object FacadeQueries {
  type Q = (SparkSession, String) => DataFrame

  case class LiftRow(id: Int, name: String, score: Double)

  val defs: Map[String, Q] = Map(
    // --- lift: local case-class collection → relation ----------------------
    "q51_lift" -> ((s, _) => {
      val ctx = new Context(s)
      ctx.lift(
          LiftRow(1, "alpha", 9.5), LiftRow(2, "beta", 7.25),
          LiftRow(3, "gamma", 8.0), LiftRow(4, "delta", 7.25))
        .select(col("id"), col("name"), (col("score") * 2).as("score2"))
        .orderBy(col("id"))
        .df
    }),

    // --- rename: prefix-rename of output columns ---------------------------
    "q52_rename" -> ((s, d) => {
      val ctx = new Context(s)
      new graft.api.DataFrame(Tables.region(s, d), ctx)
        .rename(Symbol("rkey"), Symbol("rname"))
        .select(col("rkey"), col("rname"))
        .orderBy(col("rkey"))
        .df
    }),

    // --- rand(seed): engine-portable contract (count / range / variation) --
    "q53_rand" -> ((s, d) => {
      Tables.orders(s, d).limit(1000)
        .select(rand(42).as("r"))
        .agg(
          count(lit(1)).as("n"),
          (min(col("r")) >= 0).as("min_ok"),
          (max(col("r")) < 1).as("max_ok"),
          (countDistinct(col("r")) > 900).as("varied"))
    }),

    // --- spear SQL dialect: ^ parses as POWER (Context.spearSql rewrite;
    //     DuckDB's ^ is natively power, so the oracle is the same text) -----
    "q57_spear_pow" -> ((s, d) => {
      graft.Tables.registerViews(s, d)
      val ctx = new Context(s)
      ctx.spearSql(
        """SELECT p_partkey, p_size ^ 2 AS size_sq, 2 ^ (p_partkey % 4) AS pow2
           FROM part ORDER BY p_partkey""").df
    }),

    // --- imperative/typed aggregate (Aggregator via udaf) ------------------
    "q54_imperative_topk" -> ((s, d) => {
      val top3 = udaf(new TopKLongAgg(3))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(array_join(top3(col("l_orderkey")), ",").as("top3"))
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    "q51_lift" ->
      """SELECT id, name, CAST(score * 2 AS DOUBLE) AS score2
         FROM (VALUES (1, 'alpha', 9.5), (2, 'beta', 7.25),
                      (3, 'gamma', 8.0), (4, 'delta', 7.25)) t(id, name, score)
         ORDER BY id""",
    "q52_rename" ->
      """SELECT r_regionkey AS rkey, r_name AS rname
         FROM region ORDER BY rkey""",
    "q53_rand" ->
      """SELECT count(*) AS n, min(r) >= 0 AS min_ok, max(r) < 1 AS max_ok,
                count(DISTINCT r) > 900 AS varied
         FROM (SELECT random() AS r FROM orders LIMIT 1000) t""",
    "q57_spear_pow" ->
      """SELECT p_partkey, p_size ^ 2 AS size_sq, 2 ^ (p_partkey % 4) AS pow2
         FROM part ORDER BY p_partkey""",
    "q54_imperative_topk" ->
      """SELECT l_returnflag,
                array_to_string(list_slice(list_sort(list(l_orderkey), 'DESC'), 1, 3), ',') AS top3
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
