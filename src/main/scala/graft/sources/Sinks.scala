package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output paths. The reference has no sinks at all (SURVEY.md §2.3 — its
  * only outputs are iterator/toSeq/show); Spark's writers come free, so
  * what this module adds is the layout policy a training-data pipeline
  * needs: deterministic sharding, where the output file a row lands in is
  * a pure function of the row — not of the input partitioning, cluster
  * size, or execution order — so reruns and incremental rebuilds produce
  * byte-stable layouts downstream loaders can address.
  */
object Sinks {

  /** Write `df` as parquet hash-sharded into `nShards` directories
    * (`shard=0` … `shard=n-1`) by `idCol % nShards`, rows sorted by
    * `idCol` within each shard. One shuffle on the shard id; each shard
    * directory holds exactly the rows whose id maps to it, so a downstream
    * loader can address any id's shard without an index. Returns the
    * shard column name for read-back convenience. */
  def writeSharded(
      df: DataFrame, path: String, idCol: String, nShards: Int): String = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    "shard"
  }

  /** Read a sharded dataset back; the shard directory key comes back as a
    * partition column, pruned at the scan when filtered on. */
  def readSharded(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
