package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pair every point with every interval containing
  * it. Spark plans a raw `lo <= pt AND pt <= hi` condition as a
  * nested-loop/cartesian product; this composes the standard bin trick from
  * existing operators instead: each interval is exploded to the bins it
  * covers, each point maps to exactly one bin, and the pairing becomes an
  * equi-join on the bin id followed by the exact containment filter.
  *
  * Cost: one shuffle on the bin id; interval replication factor is
  * (span / binWidth) + 1, so pick binWidth near the typical interval span.
  * Each (point, interval) candidate appears exactly once — the point lives
  * in one bin — so no distinct is needed after the join.
  */
object Ranges {

  /** Floor-division bin id in pure integer arithmetic. Column `/` is
    * Spark's `Divide`, which casts longs to double and loses integer
    * precision past 2^53, so the quotient runs through the integral `div`
    * operator instead. The numerator `x - pmod(x, w)` is an exact multiple
    * of `w` (pmod keeps floor semantics for negative x), so `div`'s
    * truncation never engages and the bin id is exact for the full long
    * range. */
  private def binOf(c: org.apache.spark.sql.Column, w: Long) =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Inner range join on long-typed bounds: rows of `points` × containing
    * rows of `intervals`, both inputs passed through unchanged (all columns
    * kept; names must not collide, and neither input may already have a
    * `__bin` column — enforced). */
  def rangeJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not contain a __bin column (internal bin key)")
    val binned = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binWidth), binOf(col(hiCol), binWidth))))
    points.withColumn("__bin", binOf(col(ptCol), binWidth))
      .join(binned, "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
