package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); these helpers cover the two
  * patterns AQE can't fix:
  *
  *  - [[saltedAggregate]]: a two-phase aggregate for heavily-skewed GROUP BY
  *    keys — phase 1 aggregates (key, salt) partials across `buckets`
  *    reducers, phase 2 merges per key. Works for any algebraic aggregate
  *    (sum/count/min/max) expressed as (partial, merge) column pairs.
  *  - [[saltedJoin]]: fact⋈dim equi-join where a handful of fact keys
  *    dominate — fact side gets a random salt in [0, buckets), dim side is
  *    exploded ×buckets, so one hot key spreads over `buckets` tasks.
  */
object Skew {

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
