package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every left row, the latest right row
  * with the same key and right.ts <= left.ts. Spark has no native ASOF
  * join; per the composition-first preference this is built from existing
  * operators — tag both sides, union, one window pass with
  * `last(_, ignoreNulls)` — so it costs a single shuffle on the key and an
  * in-partition sort, never a range-exploded join. Semantics match DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts` (verified by the
  * q58 oracle row).
  *
  * Right side must be unique per (key, ts) — pre-aggregate it (the q58
  * query takes max(value) per (user, ts)); with duplicates the matched row
  * among equal timestamps would be nondeterministic.
  *
  * Scale notes: both sides shuffle once on the key; state per partition is
  * the running last-seen right struct (O(1) per row in the frame walk);
  * skewed keys can be salted upstream with Skew helpers if one key
  * dominates.
  */
object AsOf {

  /** Left as-of join. Output: every left column plus `__asof`, a struct of
    * (`__rts` = matched right timestamp, rightValueCols...) — NULL when no
    * right row precedes the left row. */
  def asOfJoinLeft(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val r = right.select(
      col(keyCol), col(tsCol),
      struct(col(tsCol).as("__rts") +: rightValueCols.map(col): _*).as("__rv"))
    val rvType = r.schema("__rv").dataType
    // right rows (side 0) sort before left rows (side 1) at equal ts, so a
    // right row at exactly left.ts is matched (the <= tie rule)
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rTagged = r.select(left.columns.map { c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ lit(0).as("__side") :+ col("__rv"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
