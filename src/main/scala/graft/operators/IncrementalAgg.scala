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
  * == Storage: versioned, atomically-committed state ==
  *
  * `statePath` is a directory of immutable version snapshots
  * `statePath/v<id>`. A refresh writes the merged state to a staging dir
  * (`statePath/.tmp-<id>`), then commits it with one atomic directory
  * rename; older versions are pruned only after the rename succeeds. So
  * at every instant there is exactly one complete committed snapshot: a
  * crash mid-write leaves only staging garbage (overwritten on retry),
  * a crash after the rename leaves the new snapshot committed. This is
  * what makes the streaming `*Once` entry points exactly-once rather
  * than at-least-once: the committed version id doubles as the replay
  * marker, and there is no window where a marker exists without its
  * state (or state without its marker) — the failure mode of the
  * earlier write-then-touch-marker scheme. Versioning also removes the
  * read-while-overwrite hazard, so no localCheckpoint staging is needed.
  *
  * Scale shape: the delta aggregates with map-side combine before its
  * one shuffle on the key; the merge joins state with the delta on the
  * key (both already key-unique, so the join is 1:1 full-outer); state
  * size is bounded by key cardinality, not corpus size. The rename
  * commit is metadata-only on HDFS-like stores; object stores without
  * atomic rename would swap a manifest pointer instead (same protocol
  * as table formats' commit files).
  */
object IncrementalAgg {

  private val VersionRe = "v(\\d+)".r

  /** State paths already migration-checked this JVM: migrateLegacy is a
    * one-time layout upgrade, but latestVersion runs on EVERY micro-batch
    * (incrementalDedupOnce calls it three times per batch) — without the
    * memo each call pays 2-3 recursive listings plus a `_batch_*` marker
    * sweep even on an already-versioned dir, overhead that multiplies on
    * object stores where LIST is a paid round-trip. */
  private val migrationChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version ids under `statePath`, ascending. */
  private def versions(spark: SparkSession, statePath: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = fsOf(spark, statePath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(id) if st.isDirectory => Some(id.toLong)
        case _ => None
      }
    }.sorted
  }

  /** One-time migration from the pre-versioning flat layout (parquet
    * part files directly under `statePath`, optionally with `_batch_<id>`
    * markers): without this, a legacy state dir has no `v*` subdirs, so
    * the next refresh would silently re-bootstrap from the delta alone —
    * discarding the existing state. Flat data files move via a staged
    * rename into `v<max marker id>` (the legacy replay horizon — so a
    * replay of an already-merged batchId still skips, keeping
    * exactly-once across the migration), or `v0` when no marker
    * survives; markers and staging leftovers are then removed. */
  private def migrateLegacy(spark: SparkSession, statePath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = fsOf(spark, statePath)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).toSeq
    val hasVersions = entries.exists(st =>
      st.isDirectory && VersionRe.pattern.matcher(st.getPath.getName).matches())
    val flatData = entries.filter(st => st.isFile && {
      val n = st.getPath.getName
      n.endsWith(".parquet") || n == "_SUCCESS"
    })
    if (!hasVersions && flatData.exists(_.getPath.getName.endsWith(".parquet"))) {
      val MarkerRe = "_batch_(\\d+)".r
      val horizon = entries.map(_.getPath.getName).collect {
        case MarkerRe(id) => id.toLong
      }.maxOption.getOrElse(0L)
      val tmp = new org.apache.hadoop.fs.Path(s"$statePath/.tmp-migrate")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      fs.mkdirs(tmp)
      flatData.foreach { st =>
        if (!fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(tmp, st.getPath.getName)))
          throw new java.io.IOException(
            s"legacy state migration: move ${st.getPath} failed")
      }
      if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$statePath/v$horizon")))
        throw new java.io.IOException(
          s"legacy state migration: commit $tmp -> $statePath/v$horizon failed")
    }
    // markers from the old write-then-marker scheme are dead weight now
    entries.foreach { st =>
      if (st.getPath.getName.startsWith("_batch_"))
        { fs.delete(st.getPath, true); () }
    }
  }

  /** Latest committed version id, if any state has been committed.
    * Migrates a legacy flat-parquet state dir to `v0` first, so existing
    * state is never silently discarded by a re-bootstrap. */
  def latestVersion(spark: SparkSession, statePath: String): Option[Long] = {
    if (migrationChecked.add(statePath)) migrateLegacy(spark, statePath)
    versions(spark, statePath).lastOption
  }

  /** Read the latest committed state snapshot. */
  def readState(spark: SparkSession, statePath: String): DataFrame = {
    val v = latestVersion(spark, statePath).getOrElse(
      throw new IllegalStateException(s"no committed state under $statePath"))
    spark.read.parquet(s"$statePath/v$v")
  }

  /** Retract rows from a ROW-LOCAL state (one whose rows are pure
    * per-source-row functions — the chunk/IVF/JL index shape): commit a
    * new version holding the current state anti-joined against the
    * (broadcast) delete-key set. For such states this provably equals a
    * rebuild on the surviving sources, because each row's presence
    * depends only on its own source row. `deleteKeys`' columns may be any
    * subset of the state's columns (delete every chunk of a doc by
    * doc_id); absent keys no-op. NOT valid for aggregate states (df
    * counts, sums) — those need their own subtraction algebra (see
    * Bm25Index.retractFromIndex). */
  def retractRows(
      spark: SparkSession, statePath: String, deleteKeys: DataFrame,
      batchId: Long): Unit = {
    require(latestVersion(spark, statePath).nonEmpty,
      s"retractRows: no committed state under $statePath")
    val state = readState(spark, statePath)
    val dcols = deleteKeys.columns.toSeq
    require(dcols.nonEmpty && dcols.forall(state.columns.contains),
      s"delete-key columns $dcols must exist in the state schema")
    val next = state.join(
      org.apache.spark.sql.functions.broadcast(deleteKeys.distinct()),
      dcols, "left_anti")
    refreshOnceWith(spark, statePath, next, batchId, (_, dl) => dl)
  }

  /** Write `merged` to staging, atomically rename it to version `id`,
    * then prune older versions (prune only AFTER the commit, so a crash
    * at any point leaves a complete committed snapshot). */
  private def commit(
      spark: SparkSession, statePath: String, id: Long,
      merged: DataFrame): Unit = {
    val tmp = s"$statePath/.tmp-$id"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = fsOf(spark, statePath)
    val dest = new org.apache.hadoop.fs.Path(s"$statePath/v$id")
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dest))
      throw new java.io.IOException(s"commit rename $tmp -> $dest failed")
    versions(spark, statePath).filter(_ < id).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v$old"), true)
    }
    // sweep staging leftovers from crashed earlier commits (the writer is
    // single here, so anything .tmp-* other than our just-renamed dir is
    // garbage)
    fs.listStatus(new org.apache.hadoop.fs.Path(statePath)).foreach { st =>
      if (st.getPath.getName.startsWith(".tmp-"))
        { fs.delete(st.getPath, true); () }
    }
  }

  /** Merge `delta` with the latest committed snapshot (or bootstrap from
    * the delta alone) and commit the result as version `newId`. */
  private def mergeCommit(
      spark: SparkSession, statePath: String, newId: Long, delta: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val merged = latestVersion(spark, statePath) match {
      case None => delta
      case Some(v) => merge(spark.read.parquet(s"$statePath/v$v"), delta)
    }
    commit(spark, statePath, newId, merged)
  }

  private def deltaAgg(batch: DataFrame, keyCol: String, valueCol: String) =
    batch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast(DecimalType(38, 2))
          .as("vsum"),
        max(col(valueCol).cast("long")).as("vmax"))

  private def aggMerge(keyCol: String)(state: DataFrame, delta: DataFrame) =
    state.as("s").join(delta.as("d"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("s.vsum"), lit(0).cast(DecimalType(38, 2))) +
          coalesce(col("d.vsum"), lit(0).cast(DecimalType(38, 2))))
          .cast(DecimalType(38, 2)).as("vsum"),
        greatest(col("s.vmax"), col("d.vmax")).as("vmax"))

  /** Merge `batch` into the aggregate state at `statePath` (bootstraps
    * the state on first call) and return the refreshed state. Each call
    * commits a new version (latest + 1) — batch-refresh semantics where
    * every invocation merges. */
  def refresh(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val newId = latestVersion(spark, statePath).getOrElse(-1L) + 1
    mergeCommit(spark, statePath, newId,
      deltaAgg(batch, keyCol, valueCol), aggMerge(keyCol))
    readState(spark, statePath)
  }

  /** Exactly-once variant for streaming foreachBatch: merges only when
    * `batchId` is NEWER than the latest committed version, so an
    * at-least-once replay (always of the last attempted batch, ids
    * monotone under Structured Streaming's contract) either sees its
    * own committed snapshot or recomputes from the previous complete
    * one — never a double merge, never partial state. */
  def refreshOnce(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, valueCol: String, batchId: Long): Unit =
    if (latestVersion(spark, statePath).forall(_ < batchId))
      mergeCommit(spark, statePath, batchId,
        deltaAgg(batch, keyCol, valueCol), aggMerge(keyCol))

  /** The [[refreshOnce]] exactly-once versioned-commit protocol with a
    * CALLER-SUPPLIED merge — the generalization that lets any state
    * algebra ride the same storage contract (e.g.
    * [[MvMaintain.merge]] for a registered MV's full rollup set).
    * `delta` must already be the key-unique roll-up of the batch;
    * `merge(state, delta)` must return the new state with the state's
    * schema. Bootstraps from `delta` alone when no state is committed. */
  def refreshOnceWith(
      spark: SparkSession, statePath: String, delta: DataFrame,
      batchId: Long, merge: (DataFrame, DataFrame) => DataFrame): Unit =
    if (latestVersion(spark, statePath).forall(_ < batchId))
      mergeCommit(spark, statePath, batchId, delta, merge)

  /** [[refreshOnceWith]] for a state whose snapshot is SEVERAL named
    * frames ("parts") — e.g. a posting index plus its term and corpus
    * statistics tables. All parts of a version write under one staging
    * dir and commit with ONE atomic rename, so there is no cross-part
    * crash window (the failure mode a sidecar-pair written by two
    * overwrites always has — see the training-shard export's entry
    * guards). Each part merges with its own algebra; `partitionCols`
    * lets a part persist Hive-partitioned so readers can prune it
    * (the e27 cell_id pattern). */
  def refreshOnceWithParts(
      spark: SparkSession, statePath: String, batchId: Long,
      deltas: Seq[(String, DataFrame)],
      merges: Map[String, (DataFrame, DataFrame) => DataFrame],
      partitionCols: Map[String, Seq[String]] = Map.empty): Unit = {
    val prev = latestVersion(spark, statePath)
    if (prev.forall(_ < batchId)) {
      val tmp = s"$statePath/.tmp-$batchId"
      deltas.foreach { case (part, delta) =>
        val merged = prev match {
          case None => delta
          case Some(v) =>
            merges(part)(spark.read.parquet(s"$statePath/v$v/$part"), delta)
        }
        val w = merged.write.mode("overwrite")
        partitionCols.get(part).filter(_.nonEmpty)
          .fold(w)(cs => w.partitionBy(cs: _*))
          .parquet(s"$tmp/$part")
      }
      val fs = fsOf(spark, statePath)
      val dest = new org.apache.hadoop.fs.Path(s"$statePath/v$batchId")
      if (fs.exists(dest)) fs.delete(dest, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dest))
        throw new java.io.IOException(s"commit rename $tmp -> $dest failed")
      versions(spark, statePath).filter(_ < batchId).foreach { old =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v$old"), true)
      }
      fs.listStatus(new org.apache.hadoop.fs.Path(statePath)).foreach { st =>
        if (st.getPath.getName.startsWith(".tmp-"))
          { fs.delete(st.getPath, true); () }
      }
    }
  }

  /** Read one named part of the latest committed multi-part snapshot. */
  def readStatePart(
      spark: SparkSession, statePath: String, part: String): DataFrame = {
    val v = latestVersion(spark, statePath).getOrElse(
      throw new IllegalStateException(s"no committed state under $statePath"))
    spark.read.parquet(s"$statePath/v$v/$part")
  }

  /** Directory of the latest committed snapshot — an IMMUTABLE parquet
    * dir until the next commit prunes it, so it can be handed to readers
    * that bind concrete files (e.g. [[graft.plans.MvRewrite.register]]'s
    * `mvPath`); re-point such readers after each refresh. */
  def latestStateDir(spark: SparkSession, statePath: String): Option[String] =
    latestVersion(spark, statePath).map(v => s"$statePath/v$v")

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
    val newId = latestVersion(spark, statePath).getOrElse(-1L) + 1
    mergeCommit(spark, statePath, newId,
      sketchDelta(spark, batch, keyCol, valueCol), sketchMerge(spark, keyCol))
    readState(spark, statePath)
  }

  /** [[refreshOnce]] for the KLL sketch state. */
  def sketchRefreshOnce(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, valueCol: String, batchId: Long): Unit =
    if (latestVersion(spark, statePath).forall(_ < batchId))
      mergeCommit(spark, statePath, batchId,
        sketchDelta(spark, batch, keyCol, valueCol), sketchMerge(spark, keyCol))

  private def sketchDelta(
      spark: SparkSession, batch: DataFrame, keyCol: String,
      valueCol: String) = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.kllAgg
    batch.groupBy(col(keyCol))
      .agg(kllAgg(col(valueCol).cast("double")).as("sk"))
  }

  private def sketchMerge(spark: SparkSession, keyCol: String)(
      state: DataFrame, delta: DataFrame) = {
    import graft.functions.GraftFunctions.kllMergeAgg
    state.unionAll(delta).groupBy(col(keyCol))
      .agg(kllMergeAgg(col("sk")).as("sk"))
  }

  /** [[sketchRefresh]] for frequent-items sketches: the d43 heavy-hitter
    * state maintained incrementally — each batch's per-key Misra-Gries
    * sketches union into the stored ones, whose guarantees
    * (no-false-negatives above the combined error bound, [lb,ub]
    * bracketing) survive merge in ANY batching. */
  def freqRefresh(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, termCol: String, maxMapSize: Int): DataFrame = {
    val newId = latestVersion(spark, statePath).getOrElse(-1L) + 1
    mergeCommit(spark, statePath, newId,
      freqDelta(spark, batch, keyCol, termCol, maxMapSize),
      freqMerge(spark, keyCol, maxMapSize))
    readState(spark, statePath)
  }

  /** [[refreshOnce]] for the frequent-items sketch state. */
  def freqRefreshOnce(
      spark: SparkSession, statePath: String, batch: DataFrame,
      keyCol: String, termCol: String, maxMapSize: Int,
      batchId: Long): Unit =
    if (latestVersion(spark, statePath).forall(_ < batchId))
      mergeCommit(spark, statePath, batchId,
        freqDelta(spark, batch, keyCol, termCol, maxMapSize),
        freqMerge(spark, keyCol, maxMapSize))

  private def freqDelta(
      spark: SparkSession, batch: DataFrame, keyCol: String, termCol: String,
      maxMapSize: Int) = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.freqAgg
    batch.groupBy(col(keyCol))
      .agg(freqAgg(col(termCol), maxMapSize).as("sk"))
  }

  private def freqMerge(spark: SparkSession, keyCol: String, maxMapSize: Int)(
      state: DataFrame, delta: DataFrame) = {
    import graft.functions.GraftFunctions.freqMergeAgg
    state.unionAll(delta).groupBy(col(keyCol))
      .agg(freqMergeAgg(col("sk"), maxMapSize).as("sk"))
  }

  /** Drop the state (test/replay hygiene). */
  def reset(spark: SparkSession, statePath: String): Unit = {
    val hpath = new org.apache.hadoop.fs.Path(statePath)
    val fs = fsOf(spark, statePath)
    if (fs.exists(hpath)) { fs.delete(hpath, true); () }
  }
}
