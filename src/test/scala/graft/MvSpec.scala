package graft

import graft.operators.MvMaintain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** MV maintenance ⋈ aggregate navigation: the q91 summary table refreshed
  * incrementally must be bit-identical to a one-shot rebuild — which is
  * what lets a maintained MV keep serving MvRewrite without the rewrite
  * layer ever knowing a refresh happened. */
class MvSpec extends SparkTestBase {

  private val keys = Seq("l_returnflag", "l_linestatus", "l_quantity")
  private val rollups = Map(
    "mv_sum_qty" -> "sum", "mv_sum_price" -> "sum",
    "mv_cnt" -> "sum", "mv_cnt_price" -> "sum",
    "mv_min_disc" -> "min", "mv_max_tax" -> "max")

  private def mvOf(df: DataFrame): DataFrame = df
    .groupBy(keys.map(col): _*)
    .agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).as("mv_sum_qty"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("mv_sum_price"),
      count(lit(1)).as("mv_cnt"),
      count(col("l_extendedprice")).as("mv_cnt_price"),
      min(col("l_discount")).as("mv_min_disc"),
      max(col("l_tax")).as("mv_max_tax"))

  test("incremental MV refresh == one-shot rebuild (schema and rows)") {
    val li = Tables.lineitem(spark, sf)
    val b1 = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
    val b2 = li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
    val refreshed = MvMaintain.merge(mvOf(b1), mvOf(b2), keys, rollups)
    val oneShot = mvOf(li)
    assert(refreshed.schema == oneShot.schema,
      s"merge must preserve the MV schema:\n${refreshed.schema}\n${oneShot.schema}")
    assert(refreshed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(refreshed).isEmpty)
  }

  test("merge handles keys present on only one side (full-outer neutral elements)") {
    val li = Tables.lineitem(spark, sf)
    // quantity-disjoint batches: every group key exists on exactly one side
    val lo = li.filter(col("l_quantity") <= 25)
    val hi = li.filter(col("l_quantity") > 25)
    val refreshed = MvMaintain.merge(mvOf(lo), mvOf(hi), keys, rollups)
    val oneShot = mvOf(li)
    assert(refreshed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(refreshed).isEmpty)
  }
}
