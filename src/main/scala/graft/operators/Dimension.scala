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

  /** Per-key last ORIGINAL change marker — max (ts, tie) over the RAW
    * change log, BEFORE [[scdType2]]'s no-op collapse. The dim alone
    * cannot witness a collapsed change sitting after the last retained
    * one, so a pipeline that wants [[scdApply]]'s at-tail guard to be
    * EXACT persists this one-row-per-key frame alongside the dim
    * (maintained per batch by [[scdLastOriginalMerge]] — a plain max
    * semilattice, so it rides any versioned-state merge). Returns
    * (key, last_ts, last_tie). */
  def scdLastOriginal(
      changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame =
    changes.groupBy(col(keyCol))
      .agg(max(struct(col(tsCol), col(tieCol))).as("__lo"))
      .select(col(keyCol), col(s"__lo.$tsCol").as("last_ts"),
        col(s"__lo.$tieCol").as("last_tie"))

  /** Merge a batch's [[scdLastOriginal]] markers into the persisted ones
    * (max per key — order-independent, so any batching converges). */
  def scdLastOriginalMerge(
      prev: DataFrame, deltaMarkers: DataFrame, keyCol: String): DataFrame =
    prev.unionByName(deltaMarkers).groupBy(col(keyCol))
      .agg(max(struct(col("last_ts"), col("last_tie"))).as("__lo"))
      .select(col(keyCol), col("__lo.last_ts").as("last_ts"),
        col("__lo.last_tie").as("last_tie"))

  /** Apply a later change batch to an existing SCD-2 dimension: rebuild
    * ONLY the keys the delta touches (their retained change log — one
    * (valid_from, change_id, payload) change per version — unioned with
    * the delta, re-versioned by [[scdType2]]) and pass every untouched
    * key's rows through unchanged. Result ≡ building the history from
    * the full change log in one shot, PROVIDED the delta is strictly
    * later than every ORIGINAL change of the touched keys — an
    * out-of-order change landing inside a previously-collapsed run would
    * split it retroactively, which no incremental path can reproduce, so
    * the contract is enforced with a raise (the CDC at-tail contract;
    * same posture as the export guards).
    *
    * Guard exactness: with `lastOriginal` supplied (the persisted
    * [[scdLastOriginal]] markers) the guard is EXACT — it sees collapsed
    * changes too. WITHOUT it the guard can only compare against the
    * key's RETAINED history, which is strictly weaker: a no-op change
    * that [[scdType2]] collapsed can sit AFTER the last retained change,
    * and a delta landing between them passes the retained-history guard
    * yet yields a history that differs from the one-shot rebuild (the
    * collapsed change would un-collapse against the new payload). Callers
    * without the marker frame must themselves guarantee the delta is
    * strictly later than every original change of the touched keys —
    * collapsed ones included (true for ts-ordered CDC splits, the shape
    * the repo's own rows feed). */
  def scdApply(
      dim: DataFrame, delta: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payloadCols: Seq[String],
      lastOriginal: Option[DataFrame] = None): DataFrame = {
    val touched = delta.select(col(keyCol)).distinct()
    val affected = dim.join(touched, Seq(keyCol), "left_semi")
    val untouched = dim.join(touched, Seq(keyCol), "left_anti")
    // at-tail guard: every delta change strictly after the key's last
    // ORIGINAL change (exact, marker frame supplied) or last RETAINED
    // change (weaker fallback — see scaladoc) in the (ts, tie) total order
    val lastBase = lastOriginal match {
      case Some(lo) =>
        // a touched key present in the dim but missing from the marker
        // frame means the markers are stale — the guard would silently
        // degrade, so that raises too
        val stale = affected.select(col(keyCol)).distinct()
          .join(lo, Seq(keyCol), "left_anti").limit(1).count()
        require(stale == 0L,
          "scdApply: lastOriginal markers are missing a touched key that " +
            "exists in the dim — maintain them with scdLastOriginalMerge " +
            "on every applied batch")
        lo.join(touched, Seq(keyCol), "left_semi")
          .select(col(keyCol),
            struct(col("last_ts"), col("last_tie")).as("__last"))
      case None =>
        affected.groupBy(col(keyCol))
          .agg(max(struct(col("valid_from"), col("change_id"))).as("__last"))
    }
    val firstDelta = delta.groupBy(col(keyCol))
      .agg(min(struct(col(tsCol), col(tieCol))).as("__first"))
    val outOfOrder = firstDelta.join(lastBase, Seq(keyCol))
      .filter(col("__first") <= col("__last")).limit(1).count()
    require(outOfOrder == 0L,
      "scdApply: delta contains changes at or before a touched key's " +
        (if (lastOriginal.isDefined) "last original change"
         else "retained history") +
        " — an incremental apply cannot retroactively " +
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
