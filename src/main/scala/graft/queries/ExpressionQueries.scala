package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Additional scalar-expression / function-surface coverage (SURVEY.md §2.7
  * rows not yet exercised by RelationalQueries): predicates (IN, null-safe
  * equality, IS NULL, NOT, 3-valued AND/OR), complex-type constructors and
  * field access, explode/lateral (UDTF surplus), date/time functions, UDF
  * registration, pivot-style conditional aggregation, exact percentiles. */
object ExpressionQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Shared q101/s15 gate: each KLL quantile estimate (columns e10/e50/e90
    * per event_type) must be an exact data value whose true rank lies
    * within ±3% of the requested rank — asserted via exact percentiles at
    * rank ± 0.03 (value between them ⇔ rank within the margin). One
    * definition so the batch (q101) and streaming-maintained (s15) gates
    * can never drift apart. */
  private[queries] def kllRankGate(
      s: SparkSession, d: String,
      est: DataFrame): DataFrame = {
    val exact = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.07)").as("lo10"),
        expr("percentile(value, 0.13)").as("hi10"),
        expr("percentile(value, 0.47)").as("lo50"),
        expr("percentile(value, 0.53)").as("hi50"),
        expr("percentile(value, 0.87)").as("lo90"),
        expr("percentile(value, 0.93)").as("hi90"))
    est.join(exact, Seq("event_type"))
      .select(col("event_type"),
        col("e10").between(col("lo10"), col("hi10")).as("q10_ok"),
        col("e50").between(col("lo50"), col("hi50")).as("q50_ok"),
        col("e90").between(col("lo90"), col("hi90")).as("q90_ok"))
      .orderBy("event_type")
  }

  val defs: Map[String, Q] = Map(
    // --- predicates: In / NullSafeEq / IsNull / Not / 3-valued logic -------
    "q42_predicates" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_hot"),
          nullif(col("o_orderstatus"), lit("O")).as("st"),
          (col("o_totalprice") > 200000).as("big"),
          (col("o_orderkey") % 2 === 0 && col("o_totalprice") > 100000).as("even_big"))
        .withColumn("st_null", col("st").isNull)
        .withColumn("st_nse", col("st") <=> lit("F"))
        .withColumn("not_hot", !col("is_hot"))
        .drop("st")
        .orderBy("o_orderkey")
    }),

    // --- complex constructors + field/element access (complexTypes.scala;
    //     access is surplus — reference grammar has none) --------------------
    "q43_complex" -> ((s, d) => {
      Tables.nation(s, d)
        .select(
          col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("st"),
          array(col("n_nationkey"), col("n_regionkey").cast("int")).as("arr"),
          map(col("n_name"), col("n_regionkey")).as("m"))
        .select(
          col("n_nationkey"),
          col("st.name").as("st_name"),
          col("st.rk").as("st_rk"),
          element_at(col("arr"), 1).as("arr_first"),
          size(col("arr")).as("arr_len"),
          element_at(col("m"), col("st.name")).as("m_val"))
        .orderBy("n_nationkey")
    }),

    // --- explode / lateral view (UDTF surplus, §2.8) -------------------------
    "q44_explode" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
            .as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n") >= 20)
        .orderBy("token")
    }),

    // --- date/time functions (surplus: reference has zero date functions) ----
    "q45_datetime" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string").as("due"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_eoy"))
        .orderBy("o_orderkey")
    }),

    // --- scalar UDF surface (§2.8: FunctionRegistry.registerFunction) --------
    "q46_udf" -> ((s, d) => {
      // register a Scala UDF; the oracle expresses the same arithmetic inline
      val priceBand = udf((p: Double) => (p / 50000.0).toInt)
      s.udf.register("price_band", priceBand)
      Tables.orders(s, d)
        .select(col("o_orderkey"), priceBand(col("o_totalprice")).as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"))
        .orderBy("band")
    }),

    // --- pivot-style conditional aggregation ----------------------------------
    "q47_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("urgent"),
          sum(when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0)).as("high"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("rest"))
        .orderBy("o_orderstatus")
    }),

    // --- exact interpolated percentiles ----------------------------------------
    "q48_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy("l_returnflag")
    }),

    // --- sketch aggregates, self-gated (recall-row pattern): HLL++ and
    //     KLL-style quantile sketch internals are engine-specific, so the
    //     row emits accuracy invariants vs the exact in-Spark baselines —
    //     approx_count_distinct within its 5% default rsd, percentile_approx
    //     at accuracy 10⁴ within 1% of the exact median — hashed against a
    //     constant oracle. These are the estimators a 100 TB profile pass
    //     actually runs (exact count-distinct shuffles every key; the
    //     sketch is mergeable map-side state of fixed size). ------------------
    "q60_approx_sketches" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(
          approx_count_distinct(col("l_orderkey")).as("acd"),
          countDistinct(col("l_orderkey")).as("cd"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .cast("double").as("pa"),
          expr("percentile(l_extendedprice, 0.5)").as("pe"))
        .select(
          // HLL++ default relativeSD is 0.05, so ±5% is the sketch's 1σ —
          // a gate AT 1σ fails a third of datasets by design (observed: ok
          // at sf0.01/0.1, 6.6% off at sf0.001's ~1.5k cardinality). Gate
          // at 2σ: still fails a broken sketch, robust to data draw.
          (col("acd").cast("double") / col("cd")).between(0.90, 1.10).as("acd_ok"),
          (col("pa") / col("pe")).between(0.99, 1.01).as("pct_ok"))
    }),

    // --- Bloom membership prefilter, self-gated: the filter's bits are a
    //     deterministic pure function of the key set (merge is bitwise OR —
    //     order/partition independent), so the gate asserts the structural
    //     guarantees: zero false negatives over every present key, and the
    //     false-positive rate on a disjoint probe set under 2× the design
    //     point (~1% at 10 bits/key). This is the membership prefilter a
    //     pipeline uses before an expensive join (id decontamination,
    //     join pruning) — fixed-size mergeable map-side state. ---------------
    "q62_bloom_filter" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.{bloomAgg, bloomMightContain}
      val keys = Tables.lineitem(s, d)
        .select(xxhash64(col("l_orderkey")).as("k"), col("l_orderkey"))
      // the sketch is collected (25 kB) and shipped as a literal — the real
      // deployment shape: build once, broadcast into the probe-side filter
      // (might_contain requires a constant/scalar-subquery bloom)
      val bf = keys.agg(bloomAgg(col("k"), 20000L, 200000L))
        .collect().head.getAs[Array[Byte]](0)
      keys.agg(
        bool_and(bloomMightContain(lit(bf), col("k"))).as("no_false_neg"),
        (avg(when(bloomMightContain(lit(bf),
            xxhash64(col("l_orderkey") + 1000000000L)), 1.0).otherwise(0.0))
          < 0.02).as("fpr_ok"))
    }),

    // --- mergeable distinct sketches (q98): per-day DataSketches HLL over
    //     user_id, UNIONED across the 30 days per event type, estimate
    //     gated against the exact distinct. The point beyond q60's
    //     one-shot HLL++ is MERGEABILITY — at 100 TB you maintain one
    //     ~KB sketch per (type, day) partition as data lands, and any
    //     date-range distinct-user question is answered by unioning
    //     sketches, never rescanning raw events; the union is exactly the
    //     partial-aggregate algebra Spark's two-phase agg already uses,
    //     lifted to storage (same design as the d34/MV partial states).
    //     Default lgConfigK=12 → rsd ≈ 1.6%; gate at ±5% (~3σ) so a broken
    //     union fails but a data draw never does. ---------------------------
    "q98_hll_union" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val unioned = daily
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_u"))
      val exact = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_u"))
      unioned.join(exact, Seq("event_type"))
        .select(col("event_type"),
          (col("approx_u").cast("double") / col("exact_u"))
            .between(0.95, 1.05).as("union_ok"))
        .orderBy("event_type")
    }),

    // --- mergeable quantile sketches (q101): the q98 pattern lifted from
    //     distinct counts to QUANTILES. A custom KLL TypedImperativeAggregate
    //     (functions/SketchAggs.scala) builds one ~2.5 kB sketch per
    //     (event_type, day); a second union aggregate merges the 30 daily
    //     sketches per type and quantiles are read off the union — raw
    //     events are scanned once to BUILD, never to ANSWER. Exact
    //     percentiles buffer every value per group (OOM at 100 TB); the
    //     sketch is fixed-size map-side state with associative merge.
    //     Gate: each estimated quantile must be an exact data value whose
    //     true rank lies within ±3% of the requested rank — KLL k=200
    //     bounds rank error at ~1.65% w.p. 0.99, so the gate sits at ~2×
    //     the 99% bound: a broken sketch/union fails, a data draw never
    //     does. Rank containment is asserted via exact percentiles at
    //     rank ± 0.03 (value between them ⇔ rank within the margin). --------
    "q101_kll_union" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.{kllAgg, kllMergeAgg, kllQuantile}
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(kllAgg(col("value")).as("sk"))
      val unioned = daily
        .groupBy(col("event_type"))
        .agg(kllMergeAgg(col("sk")).as("sk"))
      kllRankGate(s, d, unioned.select(col("event_type"),
        kllQuantile(col("sk"), 0.10).as("e10"),
        kllQuantile(col("sk"), 0.50).as("e50"),
        kllQuantile(col("sk"), 0.90).as("e90")))
    }),

    // --- Theta sketch set algebra (q102): what the mergeable HLL/KLL rows
    //     (q98/q101) cannot do — INTERSECTION and DIFFERENCE over stored
    //     sketches. Retention ("users active on BOTH the first and last
    //     day") and churn ("first-day users never seen again") are
    //     answered from per-(type, day) Theta sketches without rescanning
    //     raw events. lgK=8 (256 nominal entries) is deliberately below
    //     the day-active cardinality at sf0.1 so ESTIMATION mode is
    //     exercised, not just the exact-mode fast path; the gate brackets
    //     the true count with the sketch's own 3σ bounds, which hold in
    //     both modes (exact mode: lb = est = ub). -----------------------------
    "q102_theta_retention" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.{thetaAgg, thetaSetOp}
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), to_date(col("ts")).as("dt"))
      val span = ev.agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
      val tagged = ev.crossJoin(broadcast(span))
        .filter(col("dt") === col("d0") || col("dt") === col("d1"))
        .select(col("event_type"), col("user_id"),
          (col("dt") === col("d0")).as("isA"))
      val sk = tagged.groupBy("event_type").agg(
        thetaAgg(when(col("isA"), col("user_id")), 8).as("ska"),
        thetaAgg(when(!col("isA"), col("user_id")), 8).as("skb"))
      val ops = sk.select(col("event_type"),
        thetaSetOp(col("ska"), col("skb"), "union").as("u"),
        thetaSetOp(col("ska"), col("skb"), "intersect").as("i"),
        thetaSetOp(col("ska"), col("skb"), "anotb").as("x"))
      val a = tagged.filter(col("isA"))
        .select("event_type", "user_id").distinct()
      val b = tagged.filter(!col("isA"))
        .select("event_type", "user_id").distinct()
      val exact = a.withColumn("inA", lit(1))
        .join(b.withColumn("inB", lit(1)),
          Seq("event_type", "user_id"), "full_outer")
        .groupBy("event_type").agg(
          count(lit(1)).as("u_ex"),
          sum(when(col("inA").isNotNull && col("inB").isNotNull, 1)
            .otherwise(0)).as("i_ex"),
          sum(when(col("inA").isNotNull && col("inB").isNull, 1)
            .otherwise(0)).as("x_ex"))
      ops.join(exact, Seq("event_type"))
        .select(col("event_type"),
          col("u_ex").between(col("u").getField("lb"), col("u").getField("ub"))
            .as("union_ok"),
          col("i_ex").between(col("i").getField("lb"), col("i").getField("ub"))
            .as("inter_ok"),
          col("x_ex").between(col("x").getField("lb"), col("x").getField("ub"))
            .as("anotb_ok"))
        .orderBy("event_type")
    }),

    // --- one-pass table profiling (q103): the ANALYZE/data-quality shape —
    //     per-column null counts, min/max, and distinct-cardinality health
    //     in ONE scan of the table. All per-column aggregates fuse into a
    //     single HashAggregate with map-side partials, and the per-column
    //     output rows come from inline(array(struct...)) over the one
    //     aggregated row — the 1-row frame is never recomputed per column.
    //     NDV is the sketch estimate (the only single-pass option — exact
    //     distinct per column would expand the scan per column); its gate
    //     compares against in-Spark exact counts at ±10% (~2σ of the HLL++
    //     default 5% rsd), the q60 calibration. min/max surface as strings
    //     so the row schema is uniform; profiled columns are restricted to
    //     int/long/varchar, whose string casts are engine-identical. ---------
    //     The exact NDVs exist only for the GATE and run as four separate
    //     single-column 2-phase aggregates — mixing countDistinct across 4
    //     columns into the profile pass triggers Catalyst's multi-distinct
    //     rewrite (5-way Expand + SortAggregate over the expanded rows:
    //     measured 6 s vs ~1 s at sf0.1), exactly the shape the profile
    //     pass itself must avoid. -----------------------------------------------
    "q103_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        approx_count_distinct(col(c)).as(s"${c}__acd")))
      val profile = li.agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), inline(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__min").as("min_s"),
          col(s"${c}__max").as("max_s"),
          col(s"${c}__acd").as("acd"))): _*)))
      val exactNdv = cols.map(c =>
          li.agg(countDistinct(col(c)).as("cd"))
            .select(lit(c).as("col_name"), col("cd")))
        .reduce(_ unionAll _)
      profile.join(broadcast(exactNdv), Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("min_s"), col("max_s"),
          (col("acd").cast("double") / col("cd")).between(0.90, 1.10)
            .as("ndv_ok"))
        .orderBy("col_name")
    }),

    // --- statistical aggregates (stddev/var/corr/covar; quantized because
    //     both engines accumulate doubles differently at the last ulp) ----------
    "q50_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          (floor(stddev_samp(col("l_quantity")) * 1e6) / 1e6).as("sd_q"),
          (floor(var_samp(col("l_quantity")) * 1e6) / 1e6).as("var_q"),
          (floor(corr(col("l_quantity"), col("l_extendedprice")) * 1e6) / 1e6).as("corr_q"),
          (floor(covar_samp(col("l_quantity"), col("l_discount")) * 1e6) / 1e6).as("cov_q"))
        .orderBy("l_returnflag")
    }),

    // --- string function breadth -------------------------------------------------
    "q49_strings" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_custkey") < 500)
        .select(
          col("c_custkey"),
          trim(col("c_name")).as("t"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          instr(col("c_name"), "1").as("pos1"),
          split(col("c_name"), "#").getItem(0).as("prefix"),
          repeat(lit("ab"), 3).as("rep"),
          reverse(col("c_mktsegment")).as("rev"))
        .orderBy("c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q50_stats" ->
      """SELECT l_returnflag,
                floor(stddev_samp(l_quantity) * 1e6) / 1e6 AS sd_q,
                floor(var_samp(l_quantity) * 1e6) / 1e6 AS var_q,
                floor(corr(l_quantity, l_extendedprice) * 1e6) / 1e6 AS corr_q,
                floor(covar_samp(l_quantity, l_discount) * 1e6) / 1e6 AS cov_q
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q42_predicates" ->
      """SELECT o_orderkey,
                o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_hot,
                o_totalprice > 200000 AS big,
                (o_orderkey % 2 = 0 AND o_totalprice > 100000) AS even_big,
                nullif(o_orderstatus, 'O') IS NULL AS st_null,
                nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS st_nse,
                NOT (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS not_hot
         FROM orders ORDER BY o_orderkey""",
    "q43_complex" ->
      """SELECT n_nationkey,
                n_name AS st_name,
                n_regionkey AS st_rk,
                n_nationkey AS arr_first,
                2 AS arr_len,
                n_regionkey AS m_val
         FROM nation ORDER BY n_nationkey""",
    "q44_explode" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS token
           FROM documents)
         SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
         FROM tok GROUP BY token HAVING count(*) >= 20 ORDER BY token""",
    "q45_datetime" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS dom,
                CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy
         FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""",
    "q46_udf" ->
      """SELECT CAST(trunc(o_totalprice / 50000.0) AS INT) AS band, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY band""",
    "q47_pivot" ->
      """SELECT o_orderstatus,
                CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
                CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS rest
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q48_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.9) AS p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q60_approx_sketches" ->
      """SELECT true AS acd_ok, true AS pct_ok""",
    "q62_bloom_filter" ->
      """SELECT true AS no_false_neg, true AS fpr_ok""",
    // the union gate must hold for every event type present in the data
    "q98_hll_union" ->
      """SELECT DISTINCT event_type, true AS union_ok
         FROM events ORDER BY event_type""",
    "q101_kll_union" ->
      """SELECT DISTINCT event_type,
                true AS q10_ok, true AS q50_ok, true AS q90_ok
         FROM events ORDER BY event_type""",
    "q102_theta_retention" ->
      """SELECT DISTINCT event_type,
                true AS union_ok, true AS inter_ok, true AS anotb_ok
         FROM events ORDER BY event_type""",
    "q103_profile" ->
      """SELECT count(*) AS n_rows, 'l_orderkey' AS col_name,
                CAST(sum(CAST(l_orderkey IS NULL AS INT)) AS BIGINT) AS n_nulls,
                CAST(min(l_orderkey) AS VARCHAR) AS min_s,
                CAST(max(l_orderkey) AS VARCHAR) AS max_s,
                true AS ndv_ok
         FROM lineitem
         UNION ALL
         SELECT count(*), 'l_linenumber',
                CAST(sum(CAST(l_linenumber IS NULL AS INT)) AS BIGINT),
                CAST(min(l_linenumber) AS VARCHAR),
                CAST(max(l_linenumber) AS VARCHAR), true
         FROM lineitem
         UNION ALL
         SELECT count(*), 'l_returnflag',
                CAST(sum(CAST(l_returnflag IS NULL AS INT)) AS BIGINT),
                min(l_returnflag), max(l_returnflag), true
         FROM lineitem
         UNION ALL
         SELECT count(*), 'l_linestatus',
                CAST(sum(CAST(l_linestatus IS NULL AS INT)) AS BIGINT),
                min(l_linestatus), max(l_linestatus), true
         FROM lineitem
         ORDER BY col_name""",
    "q50_stats" ->
      """SELECT l_returnflag,
                floor(stddev_samp(l_quantity) * 1e6) / 1e6 AS sd_q,
                floor(var_samp(l_quantity) * 1e6) / 1e6 AS var_q,
                floor(corr(l_quantity, l_extendedprice) * 1e6) / 1e6 AS corr_q,
                floor(covar_samp(l_quantity, l_discount) * 1e6) / 1e6 AS cov_q
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q49_strings" ->
      """SELECT c_custkey, trim(c_name) AS t,
                lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
                regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
                CAST(instr(c_name, '1') AS INT) AS pos1,
                string_split(c_name, '#')[1] AS prefix,
                repeat('ab', 3) AS rep,
                reverse(c_mktsegment) AS rev
         FROM customer WHERE c_custkey < 500 ORDER BY c_custkey"""
  )
}
