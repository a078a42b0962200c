package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order operations without a single-reducer sort.
  *
  * `Window.orderBy(...)` with no partition spec — the naive way to get a
  * global row number — moves EVERY row through one partition: a
  * non-starter beyond one machine's worth of data. The scalable shape is
  * the classic two-pass: range-partition on the sort key (each partition
  * holds a contiguous key range), count rows per partition, turn the
  * counts into per-partition starting offsets (a tiny frame, one row per
  * partition), and add each row's within-partition rank to its partition's
  * offset. Three shuffles of which none is a global funnel; the offsets
  * side is broadcast.
  */
object GlobalOrder {

  /** Append `global_rn` — the 1-based contiguous rank of each row in the
    * total order defined by `orderCols` (which must be a unique key for
    * the rank to be well-defined; include a tiebreaker column). The range
    * partitioning uses the full key tuple, so ties can never straddle a
    * partition boundary out of order.
    *
    * The range-partitioned frame feeds both the count pass and the final
    * join; the two plan subtrees are identical, so Spark's ReuseExchange
    * serves both from one shuffle (and even recomputed, the range
    * partitioner's fixed-seed sampling makes partition assignment
    * deterministic — the passes can never disagree). */
  def withGlobalRowNumber(
      df: DataFrame, orderCols: Seq[String],
      nPartitions: Int = 0): DataFrame =
    withGlobalRowNumberAndTotal(df, orderCols, nPartitions).drop("__n_total")

  /** [[withGlobalRowNumber]] plus a `__n_total` column carrying the total
    * row count — derived from the SAME per-partition counts frame the
    * offsets come from (one extra tiny window over the partition-count
    * frame, broadcast back with the offsets), so a caller that needs n
    * for a rank cut (ntile-style strata) avoids a separate `count()`
    * action — at 100 TB that separate action is a full extra corpus
    * scan per layout call. Empty input yields an empty frame (there is
    * no row to carry a total). */
  def withGlobalRowNumberAndTotal(
      df: DataFrame, orderCols: Seq[String],
      nPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val cols = orderCols.map(col)
    val parted = (if (nPartitions > 0) df.repartitionByRange(nPartitions, cols: _*)
                  else df.repartitionByRange(cols: _*))
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
    // one row per partition: exclusive prefix sum of partition sizes
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n_total",
        sum(col("__cnt")).over(Window.orderBy(col("__pid")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__pid"), col("__offset"), col("__n_total"))
    val w = Window.partitionBy(col("__pid")).orderBy(cols: _*)
    parted.join(broadcast(offsets), "__pid")
      .withColumn("global_rn", col("__offset") + row_number().over(w))
      .drop("__pid", "__offset")
  }

  /** Append `outCol` — each row's EXCLUSIVE running total of `valueCol`
    * within its `groupCol` group, in the total order defined by
    * `orderCols` (a unique key within the group) — without funneling any
    * group through one reducer. A per-group `Window.partitionBy(group)`
    * would cap parallelism at the number of groups (a handful of strata
    * or domains over a corpus = a funnel); the two-pass shape instead
    * range-partitions on (group, order...) so a large group SPANS
    * partitions, collapses each (partition, group) slice to one row,
    * prefix-sums those within the group (a broadcast-sized frame — at
    * most groups+partitions rows), and adds the within-slice running
    * sum. Same determinism argument as [[withGlobalRowNumber]]. */
  def withGroupedRunningTotal(
      df: DataFrame, groupCol: String, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val cols = (groupCol +: orderCols).map(col)
    val parted = df.repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(valueCol)).as("__t"))
      .withColumn("__goff",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(groupCol), col("__goff"))
    val w = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols.map(col): _*)
    parted.join(broadcast(offsets), Seq("__pid", groupCol))
      .withColumn(outCol, col("__goff") +
        sum(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)) -
        col(valueCol))
      .drop("__pid", "__goff")
  }
}
