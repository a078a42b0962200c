package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Range-sharded layout: shard i holds rows whose `valueCol` falls in
    * [bounds(i−1), bounds(i)) — shard 0 below bounds(0), the last shard at
    * or above bounds.last. Unlike hash sharding, a range predicate on
    * `valueCol` then touches a contiguous, computable subset of shards:
    * this is the data-skipping layout — at 100 TB, a scan for one value
    * band reads only the directories whose range intersects it, and the
    * planner proves it from the partition column alone (no stats table,
    * no file footers). Bounds are caller-fixed split points (derive them
    * once from `approxQuantile` at layout time), so shard assignment is a
    * pure row function and reruns are byte-stable, same as
    * [[writeSharded]]. */
  def writeRangeSharded(
      df: DataFrame, path: String, valueCol: String,
      bounds: Seq[Long]): Unit = {
    require(bounds.nonEmpty && bounds == bounds.sorted,
      "bounds must be non-empty and ascending")
    val shard = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(valueCol) >= b, 1).otherwise(0)
    }
    df.withColumn("shard", shard.cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(valueCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Shard ids a closed range [lo, hi] can touch under `bounds` — the
    * same arithmetic as the write side, evaluated on the predicate
    * endpoints. */
  def shardsForRange(bounds: Seq[Long], lo: Long, hi: Long): Seq[Int] =
    bounds.count(_ <= lo) to bounds.count(_ <= hi)

  /** Pruned scan over a [[writeRangeSharded]] layout: restrict the read
    * to the shards [lo, hi] can occupy, then apply the exact row filter.
    * The `shard` IN-list is a partition-column predicate, so pruning
    * happens at planning time — non-qualifying directories are never
    * listed, let alone read. */
  def readRangePruned(
      spark: SparkSession, path: String, valueCol: String,
      bounds: Seq[Long], lo: Long, hi: Long): DataFrame = {
    val keep = shardsForRange(bounds, lo, hi)
    readSharded(spark, path)
      .filter(col("shard").isin(keep.map(Integer.valueOf): _*))
      .filter(col(valueCol) >= lo && col(valueCol) <= hi)
  }

  // ---- Z-order layout ----------------------------------------------------

  /** Morton (Z-order) interleave of two bucket ids, `bitsPerDim` bits
    * each: a's bit i lands at position 2i+1, b's at 2i. Rows close in
    * EITHER dimension land in nearby z-shards, which is what makes a
    * single-dimension predicate prunable on a layout keyed by two —
    * the Delta/Iceberg OPTIMIZE ZORDER idea expressed as partition
    * directories. */
  def zInterleave(aBucket: Column, bBucket: Column, bitsPerDim: Int): Column =
    (0 until bitsPerDim).foldLeft(lit(0)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(aBucket.bitwiseAND(lit(1 << i)), i + 1))
        .bitwiseOR(shiftleft(bBucket.bitwiseAND(lit(1 << i)), i))
    }

  /** Driver-side mirror of [[zInterleave]] for computing prune lists. */
  def zOf(a: Int, b: Int, bitsPerDim: Int): Int =
    (0 until bitsPerDim).foldLeft(0) { (acc, i) =>
      acc | ((a & (1 << i)) << (i + 1)) | ((b & (1 << i)) << i)
    }

  /** The z-shards a predicate fixing ONE dimension's bucket can touch:
    * 2^bits of the 4^bits shards — i.e. either dimension prunes the scan
    * by a factor of 2^bits, where a range-sharded layout prunes only on
    * its single leading column. Pass `a = Some(bucket)` or
    * `b = Some(bucket)` (or both → a single shard). */
  def zShards(bitsPerDim: Int, a: Option[Int], b: Option[Int]): Seq[Int] = {
    val all = 0 until (1 << bitsPerDim)
    for {
      av <- a.map(Seq(_)).getOrElse(all)
      bv <- b.map(Seq(_)).getOrElse(all)
    } yield zOf(av, bv, bitsPerDim)
  }

  /** Write `df` parquet-partitioned by the z-interleave of two bucket
    * expressions. One shuffle on the z id; each directory holds exactly
    * one (aBucket, bBucket) cell. The bucket expressions must be pure
    * functions of the row (they are re-derivable at read time). */
  def writeZOrdered(
      df: DataFrame, path: String, aBucket: Column, bBucket: Column,
      bitsPerDim: Int): Unit = {
    require(bitsPerDim >= 1 && bitsPerDim <= 8, "1..8 bits per dimension")
    df.withColumn("zshard", zInterleave(aBucket, bBucket, bitsPerDim).cast("int"))
      .repartition(col("zshard"))
      .write.mode("overwrite").partitionBy("zshard").parquet(path)
  }

  /** Pruned scan over a [[writeZOrdered]] layout: the z-shard IN-list for
    * the fixed bucket(s) is a partition-column predicate (planning-time
    * directory pruning, same mechanism as [[readRangePruned]]); the caller
    * applies the exact residual row filter on top. */
  def readZPruned(
      spark: SparkSession, path: String, bitsPerDim: Int,
      a: Option[Int], b: Option[Int]): DataFrame = {
    val keep = zShards(bitsPerDim, a, b)
    readSharded(spark, path)
      .filter(col("zshard").isin(keep.map(Integer.valueOf): _*))
  }

  /** Shard-level incremental upsert into a [[writeSharded]] dataset:
    * replace-or-insert `updates` (same schema, no `shard` column),
    * rewriting ONLY the shard directories the update ids touch — this is
    * the point of deterministic sharding: a small update batch costs a few
    * shards, not a full-corpus rewrite. Updates win over existing rows
    * with the same id.
    *
    * Mechanics: the touched shard list (≤ nShards ints) prunes the
    * read-back to those partition directories; surviving old rows
    * (anti-join on id) union the updates; dynamic partition overwrite
    * replaces exactly the partitions present in the written frame. The
    * merged frame is localCheckpointed before the write because Spark
    * refuses to overwrite a path it is also reading — the touched-shard
    * subset must be materialized first (for huge batches, stage to a temp
    * location instead). */
  def upsertSharded(
      spark: SparkSession, path: String, updates: DataFrame,
      idCol: String, nShards: Int): Unit = {
    require(nShards > 0, "nShards must be positive")
    // bootstrap: no existing layout → the upsert IS the initial write
    // (lets streaming ingestion use one code path from batch 0 on)
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hpath)) { writeSharded(updates, path, idCol, nShards); return }
    val upd = updates.withColumn("shard",
      pmod(col(idCol), lit(nShards)).cast("int"))
    val touched = upd.select("shard").distinct().collect().map(_.getInt(0))
    val kept = readSharded(spark, path)
      .filter(col("shard").isin(touched.map(Integer.valueOf): _*))
      .join(upd.select(col(idCol)), Seq(idCol), "left_anti")
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val ck = kept.unionByName(upd.select(kept.columns.map(col): _*))
      .localCheckpoint(true)
    // deterministic block release after the write (leak-gate hygiene;
    // ContextCleaner would get there eventually, but per-batch streaming
    // ingest accumulates a block set per micro-batch until it does)
    try ck.repartition(col("shard"))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    finally {
      graft.operators.Dedup.release(ck)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    }
  }

  // ---- small-file compaction --------------------------------------------

  /** Total data bytes under `path`, any layout (flat or partitioned) —
    * the MEASURED size cost-based readers rank alternatives by (e.g.
    * [[graft.plans.MvRewrite]]'s summary-lattice navigation). Metadata-only
    * (one recursive LIST), like [[fileStats]]. */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Per-partition-directory (fileCount, totalBytes) of a Hive-layout
    * parquet path — the compaction decision input and the test assertion
    * surface. Listing is metadata-only (no file is opened); at object-store
    * scale this is the same LIST the planner itself issues. */
  def fileStats(
      spark: SparkSession, path: String): Map[String, (Int, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { dir =>
        val files = fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        dir.getPath.getName -> (files.size, files.map(_.getLen).sum)
      }.toMap
  }

  /** ceil(bytes/target) per partition value — the bin-pack plan. */
  private def binPackPlan(
      stats: Iterable[(String, Long)], targetBytes: Long): Seq[(String, Long)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    stats.map { case (value, bytes) =>
      value -> math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    }.toSeq
  }

  /** Apply a bin-pack plan to `df`: ONE shuffle keyed on (partition col,
    * `pmod(xxhash64(key), filesForThatDir)`), width = the plan's total
    * file count — tasks scale with the OUTPUT size, and hash collisions
    * between (dir, bucket) groups merge into fewer-but-larger files,
    * never more-but-smaller (the safe direction). The per-dir counts ride
    * into the plan as a tiny map-literal, so skewed days get more files
    * while quiet days collapse to one — a global `repartition(n)` can't
    * do both. Shared by [[compactTo]] and [[compactDirsInPlace]], so the
    * q95/PlansSpec geometry assertions pin BOTH paths. */
  private def binPacked(
      df: DataFrame, partitionCol: String, keyCol: String,
      plan: Seq[(String, Long)]): DataFrame = {
    val nFiles = plan.foldLeft(lit(1L)) { case (acc, (value, n)) =>
      when(col(partitionCol).cast("string") === value, lit(n)).otherwise(acc)
    }
    val width = math.max(1L, plan.map(_._2).sum).min(Int.MaxValue.toLong).toInt
    df.withColumn("__bucket", pmod(xxhash64(col(keyCol)), nFiles))
      .repartition(width, col(partitionCol), col("__bucket"))
      .drop("__bucket")
  }

  /** The shuffle stage [[compactTo]] executes, exposed so PlansSpec can
    * pin the geometry: exactly ONE exchange, keyed on (partition col,
    * planned bucket), width = planned output file count. */
  def compactionPlan(
      spark: SparkSession, src: String, partitionCol: String,
      keyCol: String, targetBytes: Long): DataFrame = {
    val plan = binPackPlan(
      fileStats(spark, src).map { case (dir, (_, bytes)) =>
        dir.substring(dir.indexOf('=') + 1) -> bytes
      }, targetBytes)
    binPacked(spark.read.parquet(src), partitionCol, keyCol, plan)
  }

  /** Bin-packed rewrite of a fragmented partitioned layout — the
    * OPTIMIZE/rewrite_data_files fix for the small-files problem, which at
    * 100 TB is an operational emergency, not a nit: a day's streaming
    * ingest leaves |micro-batches| × |tasks| tiny files per dt directory,
    * and every downstream scan then pays one open + footer read per file
    * while the NameNode/object store pays the listing.
    *
    * Each partition directory is rewritten to
    * `ceil(dirBytes / targetBytes)` files ([[binPacked]]); the only data
    * movement is that one output-sized shuffle — input fragmentation does
    * not leak into the plan. Per-dir byte totals come from [[fileStats]]
    * (metadata-only, no file opened). */
  def compactTo(
      spark: SparkSession, src: String, dst: String, partitionCol: String,
      keyCol: String, targetBytes: Long): Unit =
    compactionPlan(spark, src, partitionCol, keyCol, targetBytes)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(dst)

  /** Selective in-place compaction: rewrite ONLY the named partition
    * values (e.g. yesterday's hot dt), leaving every other directory
    * byte-untouched — the nightly-ingest pattern, where compacting the
    * whole lake daily would read 100 TB to fix 100 GB. Dynamic partition
    * overwrite replaces exactly the directories present in the written
    * frame; the rewritten subset is localCheckpointed first because Spark
    * refuses to overwrite a path it is also reading (same contract as
    * [[upsertSharded]]). */
  def compactDirsInPlace(
      spark: SparkSession, path: String, partitionCol: String,
      values: Seq[String], keyCol: String, targetBytes: Long): Unit = {
    require(values.nonEmpty, "nothing to compact")
    val stats = fileStats(spark, path)
    val plan = binPackPlan(
      values.map(v => v -> stats.getOrElse(s"$partitionCol=$v", (0, 0L))._2),
      targetBytes)
    val subset = binPacked(
      spark.read.parquet(path)
        .filter(col(partitionCol).cast("string").isin(values: _*)),
      partitionCol, keyCol, plan)
      .localCheckpoint(true)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try subset.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally {
      graft.operators.Dedup.release(subset)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    }
  }

  /** Per-shard manifest of a [[graft.operators.Packing.shardByTokenBudget]]
    * plan: `(shard_id, n_docs, n_tokens, order_digest)` where the digest is
    * md5 over the shard's doc ids joined in global-order position — the
    * loader-checkable proof that a shard holds exactly the right docs in
    * exactly the right order. One hash-aggregate over the plan; per-shard
    * digest state is bounded by docs-per-shard (budget/avg-doc-tokens —
    * tens of KB at a typical 100M-token shard), never by the corpus. */
  def trainingShardManifest(plan: DataFrame): DataFrame =
    plan.groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("pos"), col("doc_id")))),
            s => s.getField("doc_id").cast("string")))).as("order_digest"))

  // Export paths go through hadoop-fs Path/FileSystem, never java.io.File:
  // the 100 TB deployment writes to hdfs:// or s3a://, and the manifest /
  // resume machinery must behave identically there (an explicit file:/ URI
  // export is pinned in SourcesSpec).
  private def subPath(base: String, child: String): String =
    new org.apache.hadoop.fs.Path(base, child).toString
  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** One-row input fingerprint of a shard plan: exact-integer totals plus
    * an order-independent id checksum (sum of each id's 32-bit md5
    * prefix — map-side combinable, never a corpus-sized string on one
    * reducer). Equal fingerprints ⇒ same id set with overwhelming
    * probability; what the resume guard compares. */
  private def shardPlanMeta(
      plan: DataFrame, idCol: String, tokensPerShard: Long): DataFrame =
    plan.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
      min(col(idCol).cast("long")).as("min_doc_id"),
      max(col(idCol).cast("long")).as("max_doc_id"),
      coalesce(sum(conv(substring(md5(col(idCol).cast("string")), 1, 8),
        16, 10).cast("long")), lit(0L)).as("id_checksum"))
      .withColumn("tokens_per_shard", lit(tokensPerShard))

  private def withDynamicOverwrite(spark: SparkSession)(body: => Unit): Unit = {
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try body
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** Training-shard EXPORT — the pipeline's last mile: the deterministic
    * epoch-shuffle order (d42), fixed-token-budget shard assignment
    * ([[graft.operators.Packing.shardByTokenBudget]]), and the sharded
    * parquet sink composed into one operator that writes
    * `path/shard_id=k/` slices plus a `path/_manifest` parquet
    * (shard_id, n_docs, n_tokens, order_digest) and a one-row
    * `path/_meta` parquet recording the shard budget and an input
    * fingerprint (n_docs, n_tokens, max id, order-independent id
    * checksum).
    *
    * RESUME is manifest-driven and idempotent: a manifest row means that
    * shard is durable, so a rerun writes ONLY shards absent from the
    * manifest (dynamic partition overwrite — recorded shard directories
    * are never touched) and then rewrites the full manifest. Because the
    * plan is a pure function of the input, a resumed run's bytes equal a
    * fresh full run's (pinned in SourcesSpec) — PROVIDED the rerun sees
    * the same budget and input, which the `_meta` fingerprint now
    * enforces LOUDLY: a resume with a different tokensPerShard or a
    * changed input would silently mix shard layouts (recorded shards
    * keep old-budget contents while the manifest is recomputed from the
    * new plan), so it raises instead; wipe the directory — or
    * [[appendTrainingShards]] for monotone growth. A crash between a
    * shard write and its manifest row costs one shard rewrite — never
    * duplication. Rows carry (idCol, textCol, n_tokens, pos). */
  def writeTrainingShards(
      spark: SparkSession, docs: DataFrame, path: String,
      idCol: String, textCol: String, tokensPerShard: Long): Unit = {
    val plan = graft.operators.Packing
      .shardByTokenBudget(docs, idCol, textCol, tokensPerShard)
      .select(col(idCol), col(textCol), col("n_tokens"), col("pos"),
        col("token_offset"), col("shard_id"))
    val manifestPath = subPath(path, "_manifest")
    val metaPath = subPath(path, "_meta")
    val meta = shardPlanMeta(plan, idCol, tokensPerShard).localCheckpoint(true)
    try {
    // shard-count-sized: computed once up front so the resume layout check
    // and the final manifest write share one aggregation over the plan
    val newManifest = trainingShardManifest(
      plan.withColumnRenamed(idCol, "doc_id")).localCheckpoint(true)
    try {
    val done: DataFrame =
      if (pathExists(spark, manifestPath)) {
        require(pathExists(spark, metaPath),
          s"$path has a manifest but no _meta fingerprint — the export is " +
            "from an older layout or a crash window; wipe the directory " +
            "and re-export")
        val rec = spark.read.parquet(metaPath).head
        val now = meta.head
        val fields = Seq("tokens_per_shard", "n_docs", "n_tokens",
          "min_doc_id", "max_doc_id", "id_checksum")
        val diffs = fields.filter(f =>
          rec.getAs[Any](f) != now.getAs[Any](f))
        require(diffs.isEmpty,
          s"resume fingerprint mismatch at $path on ${diffs.mkString(", ")}" +
            s" (recorded $rec vs input $now): resuming would mix shard " +
            "layouts — recorded shards keep their old contents while the " +
            "manifest is recomputed from the new plan. Wipe the directory " +
            "for a changed budget/input, or appendTrainingShards for " +
            "monotone growth")
        val recorded = spark.read.parquet(manifestPath)
          .select(col("shard_id").cast("long").as("shard_id"), col("n_docs"),
            col("n_tokens"), col("order_digest"))
        // layout cross-check (r16 advice): after appendTrainingShards the
        // _meta fingerprint holds WHOLE-corpus totals, so a rerun with the
        // full grown corpus passes the field comparison above — yet the
        // recorded shards hold the append layout (batches contiguous)
        // while this plan would interleave everything. Resume is valid
        // only when every recorded shard is exactly what this plan would
        // write: recorded rows must be a SUBSET of the recomputed manifest
        // (a strict subset is the legitimate partial-manifest crash case).
        val mixed = recorded.join(newManifest,
            Seq("shard_id", "n_docs", "n_tokens", "order_digest"),
            "left_anti")
          .limit(1).count()
        require(mixed == 0L,
          s"recorded manifest rows at $path are not what this plan would " +
            "write — the export was grown with appendTrainingShards (or " +
            "its layout drifted), and resuming a full re-export over it " +
            "would mix shard layouts. Keep growing it with " +
            "appendTrainingShards, or wipe the directory for a rebuild")
        recorded.select(col("shard_id"))
      } else plan.select(col("shard_id")).limit(0)
    val toWrite = plan.join(done, Seq("shard_id"), "left_anti")
    withDynamicOverwrite(spark) {
      toWrite.write.mode("overwrite").partitionBy("shard_id")
        .parquet(subPath(path, "shards"))
    }
    newManifest.write.mode("overwrite").parquet(manifestPath)
    meta.write.mode("overwrite").parquet(metaPath)
    } finally graft.operators.Dedup.release(newManifest)
    } finally graft.operators.Dedup.release(meta)
  }

  /** APPEND-ONLY growth of a [[writeTrainingShards]] export — the
    * re-export path for a GROWING corpus: recorded shards are FROZEN
    * (bytes and mtimes untouched — pinned in SourcesSpec), and only the
    * new docs pack into NEW shard ids after the recorded maximum. The
    * delta must be strictly id-ABOVE everything exported (the d30/e18
    * monotone-append guard; overlap raises — an overlapping id would
    * either duplicate a doc or imply a mutation, both rebuilds). The
    * budget comes from the export's `_meta` (no parameter to mismatch).
    *
    * Contract vs a full re-export: NOT byte-equivalent, by design — a
    * full rebuild would md5-interleave old and new docs across ALL
    * shards (rewriting every byte); append keeps each batch its own
    * deterministically-shuffled contiguous stream, so old shard bytes
    * stay stable and a loader consumes batches in export order. The
    * stored `pos`/`token_offset` continue the global sequence; the new
    * shard ids are batch-relative (`s0 + delta_offset div budget`). An
    * empty delta is a no-op. */
  def appendTrainingShards(
      spark: SparkSession, delta: DataFrame, path: String,
      idCol: String, textCol: String): Unit = {
    val manifestPath = subPath(path, "_manifest")
    val metaPath = subPath(path, "_meta")
    require(pathExists(spark, manifestPath) && pathExists(spark, metaPath),
      s"appendTrainingShards needs an existing fingerprinted export at " +
        s"$path — writeTrainingShards creates one")
    val rec = spark.read.parquet(metaPath).head
    val budget = rec.getAs[Long]("tokens_per_shard")
    // manifest is shard-count-sized; checkpoint it once — the crash-window
    // cross-check below and the rewrite both read it (and the rewrite
    // must not read the path it overwrites)
    val oldManifest = spark.read.parquet(manifestPath)
      .select(col("shard_id").cast("long").as("shard_id"), col("n_docs"),
        col("n_tokens"), col("order_digest"))
      .localCheckpoint(true)
    try {
    // crash-window guard (r16 advice): the previous append overwrites the
    // manifest, THEN _meta. A crash between the two leaves a manifest that
    // already contains the delta next to a stale pre-append fingerprint —
    // a retry would then pass the strictly-greater id guard and re-append
    // the WHOLE delta into fresh shard ids (silent duplication). The two
    // sidecars agree on totals in every committed state, so raise on
    // mismatch and direct to the rebuild path.
    val mTot = oldManifest.agg(
      coalesce(sum(col("n_docs")), lit(0L)).as("d"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("t")).head
    require(rec.getAs[Long]("n_docs") == mTot.getLong(0) &&
      rec.getAs[Long]("n_tokens") == mTot.getLong(1),
      s"_meta and _manifest at $path disagree (_meta ${rec.getAs[Long](
        "n_docs")} docs/${rec.getAs[Long]("n_tokens")} tokens vs manifest " +
        s"${mTot.getLong(0)}/${mTot.getLong(1)}) — a crash landed between " +
        "the two sidecar overwrites; run repairTrainingShardManifest " +
        "before appending, or the delta would silently duplicate")
    val plan0 = graft.operators.Packing
      .shardByTokenBudget(delta, idCol, textCol, budget)
    val dMeta = shardPlanMeta(plan0, idCol, budget).localCheckpoint(true)
    try {
    val d = dMeta.head
    if (d.getAs[Long]("n_docs") == 0L) return
    // min(id) rides shardPlanMeta's single aggregate (r16 verdict: the
    // separate min() action re-ran the delta's whole two-pass shard plan
    // for one scalar)
    val dMin = d.getAs[Long]("min_doc_id")
    require(rec.isNullAt(rec.fieldIndex("max_doc_id")) ||
      dMin > rec.getAs[Long]("max_doc_id"),
      s"delta ids must be strictly greater than every exported id " +
        s"(append-only corpus): delta min $dMin vs exported max " +
        s"${rec.getAs[Long]("max_doc_id")} — an overlapping id means a " +
        "duplicate or a mutation; both need a fresh export")
    val s0 = oldManifest.agg(max(col("shard_id"))).head.getLong(0) + 1L
    val plan = plan0
      .withColumn("shard_id", col("shard_id") + lit(s0))
      .withColumn("pos", col("pos") + lit(rec.getAs[Long]("n_docs")))
      .withColumn("token_offset",
        col("token_offset") + lit(rec.getAs[Long]("n_tokens")))
      .select(col(idCol), col(textCol), col("n_tokens"), col("pos"),
        col("token_offset"), col("shard_id"))
    withDynamicOverwrite(spark) {
      // dynamic overwrite touches only the NEW shard directories present
      // in the frame — every recorded dir is invisible to this write
      plan.write.mode("overwrite").partitionBy("shard_id")
        .parquet(subPath(path, "shards"))
    }
    oldManifest
      .unionByName(trainingShardManifest(plan.withColumnRenamed(idCol, "doc_id")))
      .write.mode("overwrite").parquet(manifestPath)
    dMeta.select(
        (col("n_docs") + lit(rec.getAs[Long]("n_docs"))).as("n_docs"),
        (col("n_tokens") + lit(rec.getAs[Long]("n_tokens"))).as("n_tokens"),
        // the corpus minimum never moves under append (delta ids are
        // strictly above the recorded max); a null recorded min means the
        // base export was empty, so the delta's min IS the corpus min
        (if (rec.isNullAt(rec.fieldIndex("min_doc_id"))) col("min_doc_id")
         else lit(rec.getAs[Long]("min_doc_id"))).as("min_doc_id"),
        col("max_doc_id"),
        (col("id_checksum") + lit(rec.getAs[Long]("id_checksum")))
          .as("id_checksum"),
        col("tokens_per_shard"))
      .write.mode("overwrite").parquet(metaPath)
    } finally graft.operators.Dedup.release(dMeta)
    } finally graft.operators.Dedup.release(oldManifest)
  }

  /** Read a [[writeTrainingShards]] export back (the shard slices; the
    * partition column returns as `shard_id`, pruned when filtered on). */
  def readTrainingShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(subPath(path, "shards"))

  /** REBUILD an export's `_manifest` and `_meta` from the shard data —
    * the disaster-recovery path: the shard bytes are the truth and both
    * sidecars are pure functions of them, so a manifest lost or
    * corrupted mid-overwrite (the one crash window `writeTrainingShards`
    * / [[appendTrainingShards]] cannot cover, since parquet overwrite
    * deletes before it writes) is recoverable without touching a single
    * shard byte. `tokensPerShard` must be supplied — the budget is not
    * derivable from an appended export's batch-relative shard ids.
    * After repair, resume and append work exactly as before (the rebuilt
    * fingerprint equals what the writes would have recorded — pinned in
    * SourcesSpec). */
  def repairTrainingShardManifest(
      spark: SparkSession, path: String, idCol: String,
      tokensPerShard: Long): Unit = {
    // two independent scans of the shard parquet, NOT a checkpoint: the
    // export is corpus-sized, and re-reading columnar data twice beats
    // pinning it in memory
    val back = readTrainingShards(spark, path)
      .withColumn("shard_id", col("shard_id").cast("long"))
    trainingShardManifest(back.withColumnRenamed(idCol, "doc_id"))
      .write.mode("overwrite").parquet(subPath(path, "_manifest"))
    shardPlanMeta(back, idCol, tokensPerShard)
      .write.mode("overwrite").parquet(subPath(path, "_meta"))
  }
}
