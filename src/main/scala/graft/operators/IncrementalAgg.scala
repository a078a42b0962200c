package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregate state (materialized-view refresh):
  * a persisted per-key (count, decimal sum, max) table that new batches
  * MERGE into, so a daily refresh costs O(delta + state) — the base
  * corpus is never rescanned. The reference has no notion of this (its
  * queries always recompute); at 100 TB it is the difference between a
  * minutes-long delta merge and a full-corpus aggregation per refresh.
  *
  * The merge is exactly Spark's partial-aggregation algebra lifted to
  * storage: count and decimal sum are abelian-group partials (merge =
  * add, order-independent, engine-exact), max is a semilattice (merge =
  * max). Append-only by construction — deletes would need signed
  * retraction rows, which sums support but max does not (a retracted
  * max forces a per-key rescan); see CDC compaction (q62) for the
  * replace-style alternative.
  *
  * Scale shape: the delta aggregates with map-side combine before its
  * one shuffle on the key; the merge joins state with the delta on the
  * key (both already key-unique, so the join is 1:1 full-outer); state
  * size is bounded by key cardinality, not corpus size. The
  * localCheckpoint before the overwrite is required — Spark cannot
  * overwrite a path it is still reading (same as Sinks.upsertSharded;
  * for huge states, stage-and-swap instead).
  */
object IncrementalAgg {

  private def deltaAgg(batch: DataFrame, keyCol: String, valueCol: String) =
    batch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DecimalType(38, 2))
          .as("vsum"),
        max(col(valueCol).cast("long")).as("vmax"))

  /** Merge `batch` into the aggregate state at `statePath` (bootstraps
    * the state on first call) and return the refreshed state. */
  def refresh(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val delta = deltaAgg(batch, keyCol, valueCol)
    val hpath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(hpath)) delta
      else {
        val state = spark.read.parquet(statePath)
        state.as("s").join(delta.as("d"), Seq(keyCol), "full_outer")
          .select(col(keyCol),
            (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.cnt"), lit(0L)))
              .as("cnt"),
            (coalesce(col("s.vsum"), lit(0).cast(DecimalType(38, 2))) +
              coalesce(col("d.vsum"), lit(0).cast(DecimalType(38, 2))))
              .cast(DecimalType(38, 2)).as("vsum"),
            greatest(col("s.vmax"), col("d.vmax")).as("vmax"))
      }
    val ck = merged.localCheckpoint(true)
    // release the checkpoint blocks once the write has consumed them —
    // otherwise every refresh leaks one block set (QueriesSpec's leak gate)
    try ck.write.mode("overwrite").parquet(statePath)
    finally Dedup.release(ck)
    spark.read.parquet(statePath)
  }

  /** Merge `batch` into a persisted per-key KLL sketch state (the q101
    * quantile sketches maintained INCREMENTALLY): delta sketches are built
    * from the batch alone and unioned into the stored sketches, so a
    * refresh costs O(delta + key-cardinality × sketch size) — the base
    * corpus is never rescanned, and any quantile question over the keys
    * is answered from the ~2.5 kB stored sketches. Union-then-merge
    * replaces the full-outer join of [[refresh]]: sketch union is
    * associative and commutative with the empty sketch as identity, so
    * bags of (key, sketch) rows merge by plain group-by. */
  def sketchRefresh(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{kllAgg, kllMergeAgg}
    unionMergeState(spark, statePath,
      batch.groupBy(col(keyCol))
        .agg(kllAgg(col(valueCol).cast("double")).as("sk")),
      keyCol, sk => kllMergeAgg(sk))
  }

  /** [[sketchRefresh]] for frequent-items sketches: the d43 heavy-hitter
    * state maintained incrementally — each batch's per-key Misra-Gries
    * sketches union into the stored ones, whose guarantees
    * (no-false-negatives above the combined error bound, [lb,ub]
    * bracketing) survive merge in ANY batching. */
  def freqRefresh(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, termCol: String, maxMapSize: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{freqAgg, freqMergeAgg}
    unionMergeState(spark, statePath,
      batch.groupBy(col(keyCol))
        .agg(freqAgg(col(termCol), maxMapSize).as("sk")),
      keyCol, sk => freqMergeAgg(sk, maxMapSize))
  }

  /** Shared union-then-merge state body: sketch union is associative and
    * commutative with the empty sketch as identity, so the stored and
    * delta (key, sk) bags merge by plain group-by — no full-outer join. */
  private def unionMergeState(
      spark: SparkSession, statePath: String, delta: DataFrame,
      keyCol: String,
      mergeAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val hpath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(hpath)) delta
      else spark.read.parquet(statePath).unionAll(delta)
        .groupBy(col(keyCol)).agg(mergeAgg(col("sk")).as("sk"))
    val ck = merged.localCheckpoint(true)
    try ck.write.mode("overwrite").parquet(statePath)
    finally Dedup.release(ck)
    spark.read.parquet(statePath)
  }

  /** Drop the state (test/replay hygiene). */
  def reset(spark: SparkSession, statePath: String): Unit = {
    val hpath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hpath)) { fs.delete(hpath, true); () }
  }
}
