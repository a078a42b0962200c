package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default — see
  * [[withSkewJoinSplit]] and the q106 row for the split actually firing);
  * these helpers cover the patterns AQE can't fix:
  *
  *  - [[saltedAggregate]]: a two-phase aggregate for heavily-skewed GROUP BY
  *    keys — phase 1 aggregates (key, salt) partials across `buckets`
  *    reducers, phase 2 merges per key. Works for any algebraic aggregate
  *    (sum/count/min/max) expressed as (partial, merge) column pairs.
  *    (AQE's skew handling is JOIN-only: a skewed aggregate never splits.)
  *  - [[saltedJoin]]: fact⋈dim equi-join where a handful of fact keys
  *    dominate — fact side gets a random salt in [0, buckets), dim side is
  *    exploded ×buckets, so one hot key spreads over `buckets` tasks.
  *
  * == When AQE's split is enough, and when to salt (the 100 TB decision) ==
  *
  * AQE splits a skewed reduce partition into chunks of whole MAP outputs
  * and replicates the other side's matching partition — zero code change,
  * correct for inner/outer joins, and the right default. It does NOT help
  * when:
  *  - the skewed partition's bytes come from FEW map tasks (split
  *    granularity is one mapper's output — a single upstream file/stage
  *    writing the hot key leaves nothing to split; real 100 TB tables have
  *    thousands of mappers, so this bites mostly in funnels after a
  *    coalesce(1)-shaped stage);
  *  - the join sits under an operator that REQUIRES the join's hash
  *    partitioning (e.g. a same-key aggregate directly above): splitting
  *    would break co-partitioning, so AQE declines unless
  *    `spark.sql.adaptive.forceOptimizeSkewedJoin` accepts the extra
  *    shuffle — salting keeps the one-shuffle shape instead;
  *  - the hot side feeds a skewed AGGREGATE, not a join
  *    ([[saltedAggregate]]'s case).
  * Pattern caveat (PlansSpec-pinned): the rule matches Sort directly over
  * the shuffle stage, so a dim side carrying its own aggregate (e.g. a
  * `distinct` between scan and join) suppresses the split — pre-materialize
  * such dims.
  */
object Skew {

  /** Run `body` with the AQE skew-join thresholds lowered so the split
    * fires on test-scale data (production defaults: 256 MB partition
    * threshold, 64 MB advisory target — correct for real clusters, far
    * above any local SF). Restores prior values afterwards. Both the
    * detection threshold and the split target scale together: a partition
    * is skewed if > max(threshold, 5 × median) and splits into
    * ~advisory-sized chunks of whole map outputs. */
  def withSkewJoinSplit[T](
      spark: org.apache.spark.sql.SparkSession,
      thresholdBytes: Long = 2048, advisoryBytes: Long = 1024)(body: => T): T = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // -1 broadcast thresholds: the split only exists for shuffle joins
      conf.set(keys(0), "-1")
      conf.set(keys(1), "-1")
      conf.set(keys(2), thresholdBytes.toString)
      conf.set(keys(3), advisoryBytes.toString)
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  /** Two-phase skew-safe aggregation.
    * `partials`: aggregates computed per (key, salt);
    * `merges`: how to combine the partial columns per key.
    * Example: sum → partial `sum(x) as s`, merge `sum(s) as s`. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[Column],
      partials: Seq[Column],
      merges: Seq[Column],
      buckets: Int = 16): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val salted = df.withColumn("__salt",
      (rand(42) * buckets).cast("int"))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Skew-safe fact⋈dim equi-join: salt the (large, skewed) fact side,
    * replicate the dim side ×buckets, join on (key, salt). Output columns =
    * fact.* ++ dim.* (minus the dim join key). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      buckets: Int = 16): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    saltedFact
      .join(explodedDim,
        saltedFact(factKey) === explodedDim(dimKey) &&
          saltedFact("__salt") === explodedDim("__salt"))
      .drop(explodedDim("__salt"))
      .drop("__salt")
      .drop(explodedDim(dimKey))
  }
}
