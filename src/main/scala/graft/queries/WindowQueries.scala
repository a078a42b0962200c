package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage (SURVEY.md §2.6 — the reference parses/analyzes
  * the full frame surface but cannot execute it; we make all of it run) plus
  * event-time queries over the `events` table.
  *
  * Frames are always pinned explicitly (the reference's documented default
  * is ROWS UNBOUNDED PRECEDING..CURRENT ROW while Spark's ordered default is
  * RANGE — SURVEY §2.6). Every ORDER BY ends in a unique key so ranking
  * output is deterministic. Double sums over random data are fixed-point
  * quantized (floor(x*1000) as BIGINT) so accumulation is exact and
  * order-independent in both engines.
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // --- ranking: row_number / rank / dense_rank -------------------------
    "q33_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- running aggregate, ROWS UNBOUNDED PRECEDING..CURRENT ROW
    //     (the reference's default frame, WindowSpec.scala:78-82) ----------
    "q34_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") < 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("running_qty"),
          count(lit(1)).over(w).as("running_n"),
          max(col("l_quantity")).over(w).as("running_max"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // --- lag / lead ---------------------------------------------------------
    "q35_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("user_id") < 100)
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta_v"))
        .orderBy("user_id", "event_id")
    }),

    // --- RANGE frame over a numeric ordering key (WindowSpec RangeFrame) ----
    "q36_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey").asc)
        .rangeBetween(-10, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderstatus"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_in_range"))
        .orderBy("o_orderstatus", "o_orderkey")
    }),

    // --- bounded ROWS frames + first/last/nth value --------------------------
    "q37_window_frames" -> ((s, d) => {
      val base = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").asc)
      val near = base.rowsBetween(-2, 1)
      val tail = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(near).as("near_qty"),
          min(col("l_quantity")).over(tail).as("tail_min"),
          first(col("l_quantity")).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_qty"),
          last(col("l_quantity")).over(tail).as("last_qty"),
          nth_value(col("l_quantity"), 2).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // --- distribution functions: ntile / percent_rank / cume_dist ------------
    "q38_window_dist" -> ((s, d) => {
      val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    }),

    // --- event-time tumbling aggregation (fixed-point exact sums) ------------
    "q39_time_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("hour", "event_type")
    }),

    // --- sessionization via lag + cumulative flag sum -------------------------
    "q40_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // --- as-of (point-in-time) join: for each click, the latest view by the
    //     same user at or before the click (operators/AsOf.scala; DuckDB
    //     ASOF LEFT JOIN is the oracle) --------------------------------------
    "q58_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
      graft.operators.AsOf.asOfJoinLeft(clicks, views, "user_id", "ts",
          Seq("view_value"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("click_us"),
          unix_micros(col("__asof.__rts")).as("view_us"),
          col("__asof.view_value").as("view_value"))
        .orderBy("user_id", "event_id")
    }),

    // --- range (interval) join via binning: quantities × containing size
    //     bands (operators/Ranges.scala; plain BETWEEN join is the oracle) ----
    "q59_range_join" -> ((s, d) => {
      val points = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("qty")).distinct()
      val intervals = Tables.part(s, d)
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          (col("p_size") - 2).cast("long").as("lo"),
          (col("p_size") + 2).cast("long").as("hi"))
      graft.operators.Ranges.rangeJoin(points, "qty", intervals, "lo", "hi",
          binWidth = 5L)
        .select(col("qty"), col("p_partkey"), col("lo"), col("hi"))
        .orderBy("qty", "p_partkey")
    }),

    // --- deterministic first/last via windows (reference first/last default
    //     ignoreNulls=true, aggregates/basic.scala:38-108) ---------------------
    "q41_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"),
          first(col("event_type"), ignoreNulls = true).over(w).as("first_type"),
          last(col("event_type"), ignoreNulls = true).over(w).as("last_type"))
        .distinct()
        .orderBy("user_id", "event_id")
    }),

    // --- global contiguous rank WITHOUT a single-reducer sort: range
    //     partition + per-partition offsets (operators/GlobalOrder.scala);
    //     the oracle is the naive global window, which only one engine on
    //     one machine can afford — equality proves the two-pass
    //     decomposition exact ---------------------------------------------------
    "q61_global_rank" -> ((s, d) => {
      graft.operators.GlobalOrder.withGlobalRowNumber(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          Seq("o_orderdate", "o_orderkey"), nPartitions = 8)
        .select(col("o_orderkey"), col("global_rn"))
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q33_window_rank" ->
      """SELECT o_custkey, o_orderkey,
         row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q61_global_rank" ->
      """SELECT o_orderkey,
                row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS global_rn
         FROM orders ORDER BY o_orderkey""",
    "q34_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         sum(l_quantity) OVER w AS running_qty,
         count(*) OVER w AS running_n,
         max(l_quantity) OVER w AS running_max
         FROM lineitem WHERE l_suppkey < 20
         WINDOW w AS (PARTITION BY l_suppkey
                      ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q35_window_lag" ->
      """SELECT user_id, event_id,
         lag(event_type, 1) OVER w AS prev_type,
         lead(event_type, 1) OVER w AS next_type,
         value - lag(value, 1) OVER w AS delta_v
         FROM events WHERE user_id < 100
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         ORDER BY user_id, event_id""",
    "q36_window_range" ->
      """SELECT o_orderstatus, o_orderkey,
         count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
                        RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_in_range
         FROM orders WHERE o_orderkey < 3000
         ORDER BY o_orderstatus, o_orderkey""",
    "q37_window_frames" ->
      """SELECT l_orderkey, l_linenumber,
         sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS near_qty,
         min(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tail_min,
         first_value(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_qty,
         last_value(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_qty,
         nth_value(l_quantity, 2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_qty
         FROM lineitem WHERE l_orderkey < 300
         ORDER BY l_orderkey, l_linenumber""",
    "q38_window_dist" ->
      """SELECT c_custkey,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
         FROM customer
         WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
         ORDER BY c_custkey""",
    "q39_time_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type, count(*) AS n,
         CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value,
         min(value) AS min_value, max(value) AS max_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q40_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
                  lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
           FROM events)
         SELECT user_id,
                CAST(sum(CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM e GROUP BY user_id ORDER BY user_id""",
    "q59_range_join" ->
      """WITH points AS (
           SELECT DISTINCT CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
         intervals AS (
           SELECT p_partkey, CAST(p_size - 2 AS BIGINT) AS lo,
                  CAST(p_size + 2 AS BIGINT) AS hi
           FROM part WHERE p_partkey < 100)
         SELECT p.qty, i.p_partkey, i.lo, i.hi
         FROM points p JOIN intervals i ON p.qty BETWEEN i.lo AND i.hi
         ORDER BY qty, p_partkey""",
    "q58_asof_join" ->
      """WITH clicks AS (
           SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max(value) AS view_value FROM events
           WHERE event_type = 'view' GROUP BY user_id, ts)
         SELECT c.user_id, c.event_id, epoch_us(c.ts) AS click_us,
                epoch_us(v.ts) AS view_us, v.view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.user_id, c.event_id""",
    "q41_first_last" ->
      """SELECT DISTINCT user_id, event_id,
         first_value(event_type) OVER w AS first_type,
         last_value(event_type) OVER w AS last_type
         FROM events WHERE user_id < 200
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id"""
  )
}
