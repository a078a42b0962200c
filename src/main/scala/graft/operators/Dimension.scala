package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (SCD Type 2): turn a change log
  * into a versioned dimension with validity intervals, and apply later
  * change batches incrementally.
  *
  * Scale shape: everything is keyed by the dimension key — the history
  * build is two windows over one key-partitioned shuffle (no global
  * funnel; a key's history lands on one reducer, the standard bound for
  * per-entity versioning), and the incremental apply touches only the
  * keys present in the delta (semi/anti join on the key, then a rebuild
  * of the touched keys' histories — O(delta keys' history), never a full
  * dimension rewrite).
  */
object Dimension {

  /** Build the SCD-2 history from a change log: per key ordered by
    * (tsCol, tieCol) — tieCol must be unique within a key to make the
    * order total — consecutive changes with identical payloads collapse
    * (a reported change that changes nothing is not a new version), then
    * each surviving change becomes one version row:
    * (key, version, payload…, valid_from, valid_to, is_current,
    * change_id). `valid_to` is the next version's `valid_from` (NULL on
    * the current row) — the standard half-open [from, to) convention.
    * `change_id` carries tieCol through so a rebuilt history preserves
    * the original total order ([[scdApply]] depends on it). */
  def scdType2(
      changes: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val pay = struct(payloadCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val dedup = changes
      .withColumn("__prev", lag(pay, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> pay))
      .drop("__prev")
    dedup
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: col("version") +: payloadCols.map(col)) ++
        Seq(col(tsCol).as("valid_from"), col("valid_to"),
          col("is_current"), col(tieCol).as("change_id")): _*)
  }

  /** A dimension's retained change log — one (key, ts, tie, payload…)
    * change per version. scdType2(dimAsChanges(dim)) ≡ dim (lossless),
    * which is what lets a BATCH's own history ride a versioned-state
    * commit protocol whose bootstrap commits the delta verbatim: the
    * delta IS a dim, and the merge converts it back to changes. */
  def dimAsChanges(
      dim: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame =
    dim.select(
      (col(keyCol) +: col("valid_from").as(tsCol) +:
        col("change_id").as(tieCol) +: payloadCols.map(col)): _*)

  /** Apply a later change batch to an existing SCD-2 dimension: rebuild
    * ONLY the keys the delta touches (their retained change log — one
    * (valid_from, change_id, payload) change per version — unioned with
    * the delta, re-versioned by [[scdType2]]) and pass every untouched
    * key's rows through unchanged. Result ≡ building the history from
    * the full change log in one shot, PROVIDED the delta is strictly
    * later than each touched key's retained history — an out-of-order
    * change landing inside a previously-collapsed run would split it
    * retroactively, which no incremental path can reproduce, so that
    * contract is enforced with a raise (the CDC at-tail contract; same
    * posture as the export guards). */
  def scdApply(
      dim: DataFrame, delta: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val touched = delta.select(col(keyCol)).distinct()
    val affected = dim.join(touched, Seq(keyCol), "left_semi")
    val untouched = dim.join(touched, Seq(keyCol), "left_anti")
    // at-tail guard: every delta change strictly after the key's last
    // retained change in the (ts, tie) total order
    val lastBase = affected.groupBy(col(keyCol))
      .agg(max(struct(col("valid_from"), col("change_id"))).as("__last"))
    val firstDelta = delta.groupBy(col(keyCol))
      .agg(min(struct(col(tsCol), col(tieCol))).as("__first"))
    val outOfOrder = firstDelta.join(lastBase, Seq(keyCol))
      .filter(col("__first") <= col("__last")).limit(1).count()
    require(outOfOrder == 0L,
      "scdApply: delta contains changes at or before a touched key's " +
        "retained history — an incremental apply cannot retroactively " +
        "split collapsed runs; rebuild those keys with scdType2 instead")
    val baseChanges =
      dimAsChanges(affected, keyCol, tsCol, tieCol, payloadCols)
    val deltaChanges = delta.select(
      (col(keyCol) +: col(tsCol) +: col(tieCol) +:
        payloadCols.map(col)): _*)
    val rebuilt = scdType2(baseChanges.unionByName(deltaChanges),
      keyCol, tsCol, tieCol, payloadCols)
    untouched.unionByName(rebuilt)
  }
}
