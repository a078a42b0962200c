package graft.queries

import graft.Tables
import graft.operators.{Dedup, UrlCuration}
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Structured Streaming rows under the DuckDB correctness gate: each runs a
  * real streaming query (file source → watermarked transform → sink) to
  * completion and returns the materialized result, which the oracle
  * reproduces with batch SQL over the same events table. This is the
  * batch-equivalence contract Structured Streaming promises — here it is
  * hash-checked per round instead of sbt-only (StreamingSpec).
  *
  * Scale notes: the file source is the production ingest shape (list a
  * directory, process new files per micro-batch); every transform is
  * watermark-bounded so state is finite at any corpus size; the memory
  * sink stands in for the result table only because the gate needs a
  * collectable DataFrame — the 100 TB path swaps it for a parquet/foreachBatch
  * sink with identical upstream semantics (s02 exercises exactly that).
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runNonce = java.lang.Long.toHexString(System.nanoTime())
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // separate map for the s02 ingest layout: its builder calls stageEvents,
  // and a ConcurrentHashMap mapping function must never touch the same map
  // (nested computeIfAbsent on one map throws "Recursive update" when the
  // keys share a bin)
  private val ingested = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val mvMaintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val mvJoinback = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val qualityRouted = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamDedup = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamDomcap = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamDecontam = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val signalIngested = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val datasheetMaintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val chunkIndexIngested = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val bm25Maintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val sketchMaintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val freqMaintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // memory-sink temp views from prior drains: each holds a full result
  // copy in driver memory, so the next drain drops them before starting
  // (every caller consumes the returned frame within its own invocation)
  private val liveSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def tmpDir(tag: String, create: Boolean = true): java.io.File = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stream_${tag}_${runNonce}_${seq.incrementAndGet()}")
    // the sharded-layout dir must NOT pre-exist: upsertSharded's bootstrap
    // branch keys on fs.exists(path)
    if (create) f.mkdirs()
    sys.addShutdownHook {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(f)
    }
    f
  }

  /** Stage the events parquet into a listable directory (`copies` copies) —
    * the file source's input contract — memoized per (sf dir, copies).
    * Handles both layouts: a single parquet FILE (the driver testdata
    * shape) and a parquet DIRECTORY of part files (anything Spark wrote,
    * e.g. the ScaleSmoke tiles) — a naive Files.copy of a directory copies
    * only the empty dir entry and silently yields a zero-row stream. */
  private def stageEvents(d: String, copies: Int): String =
    staged.computeIfAbsent(s"$d#$copies", { _ =>
      val dir = tmpDir("src")
      val src = java.nio.file.Paths.get(s"$d/events.parquet")
      val parts: Seq[java.nio.file.Path] =
        if (java.nio.file.Files.isDirectory(src)) {
          val s = java.nio.file.Files.list(src)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toList
          } finally s.close()
        } else Seq(src)
      for (i <- 1 to copies; (p, j) <- parts.zipWithIndex) {
        java.nio.file.Files.copy(p, dir.toPath.resolve(s"events_${i}_$j.parquet"))
      }
      dir.toString
    })

  /** Stage both events layouts (1-copy and the s03 2-copy dir) for a data
    * dir without running any query — lets harnesses (ScaleSmoke) keep the
    * one-time copy outside timed runs. */
  def prestage(d: String): Unit = { stageEvents(d, 1); stageEvents(d, 2); () }

  /** Probe access to the staged streaming source (tools/StateProbe). */
  private[graft] def eventsStreamFor(s: SparkSession, d: String): DataFrame =
    eventsStream(s, d)

  /** readStream over the staged events dir, with the same ts normalization
    * as the batch path (Tables.events): LONG nanos → micros, TIMESTAMP_NTZ
    * → TIMESTAMP (instant-exact under the pinned UTC session). Watermarks
    * require TimestampType, so every branch must land there. */
  private def eventsStream(s: SparkSession, d: String, copies: Int = 1): DataFrame =
    eventsStreamOver(s, d, stageEvents(d, copies))

  /** [[eventsStream]] over an EXPLICIT source dir with source options —
    * probe access (tools/StateProbe restore mode stages its own files to
    * control batch boundaries and post-restart input). */
  private[graft] def eventsStreamOver(
      s: SparkSession, d: String, dir: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val raw = s.readStream.schema(schema).options(options).parquet(dir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Run a streaming DataFrame to completion into a uniquely-named memory
    * sink and return the materialized table. */
  /** Run `body` (which starts and drains a streaming query) with the
    * shuffle-partition count — which for Structured Streaming is the STATE
    * partition count, fixed at first checkpoint — set to `n`, restoring
    * the session default afterwards. Sizing state partitions to expected
    * key cardinality is a first-class streaming deployment decision, not a
    * bench tweak: it cannot be changed after the checkpoint exists, so
    * real jobs choose it up front (snapshot/changelog maintenance and
    * per-batch task launch scale with partition count — at this SF, 32
    * oversized partitions cost a stream-stream join 6.8 s vs 2.7 s at 8;
    * a 100 TB deployment with millions of hot keys sizes UP instead). */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    // GRAFT_STATE_PARTITIONS overrides the per-row default for A/B
    // measurement of the state-partition sizing decision (it cannot be
    // changed after a checkpoint exists, so rows choose it up front)
    val eff = sys.env.get("GRAFT_STATE_PARTITIONS")
      .map(_.toInt).getOrElse(n)
    s.conf.set(key, eff.toString)
    try body finally s.conf.set(key, prev)
  }

  private def drain(df: DataFrame, complete: Boolean): DataFrame =
    drainMode(df,
      if (complete) org.apache.spark.sql.streaming.OutputMode.Complete()
      else org.apache.spark.sql.streaming.OutputMode.Update())

  /** NOT thread-safe — strictly sequential callers only (Verify/Bench run
    * queries one at a time, and the streaming specs share one suite
    * thread). The drop-then-register dance below reclaims the PREVIOUS
    * drain's memory-sink view; two concurrent drains on one session could
    * drop a view the other is still reading. */
  private def drainMode(
      df: DataFrame, mode: org.apache.spark.sql.streaming.OutputMode): DataFrame = {
    var prev = liveSinks.poll()
    while (prev != null) {
      df.sparkSession.catalog.dropTempView(prev); prev = liveSinks.poll()
    }
    val name = s"stream_sink_${runNonce}_${seq.incrementAndGet()}"
    val q = EventStreams.toMemorySinkMode(df, name, mode)
    try q.processAllAvailable() finally q.stop()
    liveSinks.add(name)
    df.sparkSession.table(name)
  }

  /** The s25 streamed chunk-index ingest, memoized per (JVM, sf dir):
    * file-source micro-batches chunk + embed ONLY their own docs (all
    * row-local, so a delta's index rows are bit-identical to a full
    * rebuild's) into idempotent per-batch dirs. Returns the index dir;
    * shared by s25 (dense retrieval gate) and s27 (hybrid serving). */
  private def streamedChunkIndexFor(s: SparkSession, d: String): String =
    chunkIndexIngested.computeIfAbsent(d, { _ =>
      val corpus = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val srcDir = tmpDir("schunksrc")
      def stage(df: DataFrame, name: String): Unit = {
        val tmp = tmpDir("schunkw")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(srcDir, name).toPath); ()
      }
      stage(corpus.filter(pmod(col("doc_id"), lit(2)) === 0), "docs_0.parquet")
      stage(corpus.filter(pmod(col("doc_id"), lit(2)) === 1), "docs_1.parquet")
      val out = tmpDir("schunkout", create = false).toString
      val ckpt = tmpDir("schunkckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = EventStreams.transformIngest(stream,
        b => graft.operators.Similarity.chunkIndex(b, "doc_id", "text"),
        out, ckpt.toString)
      try q.processAllAvailable() finally q.stop()
      out
    })

  /** The s26 streamed BM25 posting-index maintenance, memoized per
    * (JVM, sf dir): each micro-batch tokenizes only its own chunks and
    * merges under [[graft.operators.Bm25Index.extendIndex]]'s exactly-once
    * versioned commit. Chunking is row-local per doc, so splitting WHOLE
    * DOCS at a doc_id cut keeps the two snapshots' (doc_id, chunk_id)
    * item sets disjoint AND monotone on keyCols.head — what the posting
    * append guard and the additive-df merge both require; files are
    * staged in monotone doc_id order (s20's crawl-snapshot staging).
    * Returns the committed state path; shared by s26 and s27. */
  private def streamedBm25StateFor(s: SparkSession, d: String): String =
    bm25Maintained.computeIfAbsent(d, { _ =>
      val corpus = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val chunks = graft.operators.Packing
        .chunkTokens(corpus, "doc_id", "text", 16, 0)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      val cut = corpus.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
      val srcDir = tmpDir("sbm25src")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("sbm25w")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(srcDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(chunks.filter(col("doc_id") <= cut), "snap_0.parquet",
        now - 60000)
      stage(chunks.filter(col("doc_id") > cut), "snap_1.parquet", now)
      val state = tmpDir("sbm25state", create = false).toString + "/state"
      val ckpt = tmpDir("sbm25ckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // versions 2b (extend) / 2b+1 (maintenance) keep both commits
          // monotone and replay-safe (a replayed batch no-ops on both)
          graft.operators.Bm25Index.extendIndex(s, state, batch,
            Seq("doc_id", "chunk_id"), "chunk_text", 2 * batchId)
          // segment-count maintenance wired where a production ingest
          // runs it: after every extend. The 1-segment budget is
          // deliberately tight so the gate exercises an actual mid-stream
          // fold (production would run 16+); folds are read-invisible, so
          // s26/s27's maintained ≡ rebuild oracles gate the interleaved
          // extend/compact/extend sequence end to end.
          graft.operators.Bm25Index.compactIndexSegmentsWhenDue(s, state,
            2 * batchId + 1, maxSegments = 1)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      state
    })

  private val scd2Maintained = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The s28 streamed SCD-2 maintenance, memoized per (JVM, sf dir):
    * events staged as two files split at the SAME (min+max)/2 micros
    * midpoint as q110, arriving in monotone ts order (the CDC at-tail
    * contract [[graft.operators.Dimension.scdApply]] enforces). Each
    * micro-batch versions ONLY its own changes
    * ([[graft.operators.Dimension.scdType2]] of the batch — a valid dim,
    * so the commit protocol's bootstrap-from-delta is correct), and the
    * merge replays the batch's retained change log through scdApply with
    * the EXACT at-tail guard: a `markers` part (per-key last ORIGINAL
    * change, [[graft.operators.Dimension.scdLastOriginal]] — collapsed
    * no-op changes included, which the dim alone cannot witness)
    * rides the SAME atomic multi-part commit as the dim, and each
    * batch's apply guards against the PRIOR version's markers. Returns
    * the committed state path; read the dimension via part `dim`. */
  private def streamedScd2StateFor(s: SparkSession, d: String): String =
    scd2Maintained.computeIfAbsent(d, { _ =>
      import graft.operators.{Dimension, IncrementalAgg}
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      val mm = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head
      val cut = (mm.getLong(0) + mm.getLong(1)) / 2
      val srcDir = tmpDir("scd2src")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("scd2w")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(srcDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(ev.filter(unix_micros(col("ts")) <= cut), "half_0.parquet",
        now - 60000)
      stage(ev.filter(unix_micros(col("ts")) > cut), "half_1.parquet", now)
      val state = tmpDir("scd2state", create = false).toString + "/state"
      val ckpt = tmpDir("scd2ckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val deltaDim = Dimension.scdType2(batch, "user_id", "ts",
            "event_id", Seq("event_type"))
          val deltaMarkers = Dimension.scdLastOriginal(batch, "user_id",
            "ts", "event_id")
          IncrementalAgg.appendOnceWithParts(s, state, batchId,
            appendDeltas = Seq.empty,
            rewriteDeltas = Seq("dim" -> deltaDim,
              "markers" -> deltaMarkers),
            rewriteMerges = Map(
              "dim" -> ((dim: DataFrame, delta: DataFrame) =>
                Dimension.scdApply(dim,
                  Dimension.dimAsChanges(delta, "user_id", "ts",
                    "event_id", Seq("event_type")),
                  "user_id", "ts", "event_id", Seq("event_type"),
                  // readStatePart resolves the PRIOR committed version
                  // until the rename publishes this batch — exactly the
                  // markers the guard must compare against
                  lastOriginal = Some(IncrementalAgg.readStatePart(s,
                    state, "markers")))),
              "markers" -> ((prev: DataFrame, delta: DataFrame) =>
                Dimension.scdLastOriginalMerge(prev, delta, "user_id"))))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      state
    })

  private val retractMaintained = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val funnelStaged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Events staged as TWO ts-monotone halves (split at the (min+max)/2
    * micros midpoint), memoized per (JVM, sf dir) — the arrival contract
    * the s30 funnel-anchor and s31 retention-bitmap folds require. */
  private def funnelStagedDirFor(s: SparkSession, d: String): String =
    funnelStaged.computeIfAbsent(d, { _ =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      val mm = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head
      val cut = (mm.getLong(0) + mm.getLong(1)) / 2
      val dir = tmpDir("sfunnelsrc")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("sfunnelw")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(dir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(ev.filter(unix_micros(col("ts")) <= cut), "half_0.parquet",
        now - 60000)
      stage(ev.filter(unix_micros(col("ts")) > cut), "half_1.parquet", now)
      dir.toString
    })

  private val cachedServeMaintained =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The s32 streamed CACHED serving, memoized per (JVM, sf dir): e30's
    * posting index built once offline, then query batches arrive as a
    * stream — batch 0 is the first HALF of the query set (all misses,
    * cache populated O(misses)), batch 1 is the FULL set (the first half
    * resolves as cross-batch cache HITS, only the second half pays the
    * index serve). Each batch's results land in an idempotent per-batch
    * dir (the transformIngest pattern — a replayed batch overwrites its
    * own output, and a replayed cache append no-ops under the versioned
    * commit, so at-least-once delivery is safe end to end). Returns the
    * output dir; the row reads batch 1 — the full query set served
    * THROUGH the cache. */
  private def streamedCachedServeFor(s: SparkSession, d: String): String =
    cachedServeMaintained.computeIfAbsent(d, { _ =>
      import graft.operators.{Bm25Index, Packing}
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val chunks = Packing.chunkTokens(corpus, "doc_id", "text", 16, 0)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      val state = tmpDir("scsrvstate", create = false).toString + "/state"
      Bm25Index.extendIndex(s, state, chunks,
        Seq("doc_id", "chunk_id"), "chunk_text", batchId = 0L)
      val cache = tmpDir("scsrvcache", create = false).toString + "/cache"
      val queries = docs.filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      val cut = queries.agg(max(col("doc_id"))).head.getLong(0) / 2
      val srcDir = tmpDir("scsrvsrc")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("scsrvw")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(srcDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(queries.filter(col("doc_id") <= cut), "qbatch_0.parquet",
        now - 60000)
      stage(queries, "qbatch_1.parquet", now)
      val out = tmpDir("scsrvout").toString
      val ckpt = tmpDir("scsrvckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Bm25Index.bm25TopKBatchCached(s, state, cache, batch,
              Seq("doc_id", "chunk_id"), "doc_id", "text", k = 10)
            .write.mode("overwrite").parquet(s"$out/b$batchId")
          // cache maintenance wired where a serving loop runs it: after
          // every batch. The 1-segment budget deliberately forces a
          // mid-stream prune+fold (production would use 8+); maintenance
          // is read-invisible for live entries, so s32's served ≡
          // recompute oracle gates the maintained cache end to end.
          Bm25Index.maintainQueryCache(s, state, cache, k = 10,
            maxSegments = 1)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      out
    })

  /** The s29 streamed takedown, memoized per (JVM, sf dir): e34's posting
    * index built in full at batch 0, then the %13-block deletion requests
    * arrive as TWO micro-batched delete files; each batch retracts in
    * place under the versioned commit (a replayed batch no-ops — the
    * retraction recomputes from the already-retracted state but the
    * version guard refuses the commit). Returns the state path. */
  private def streamedRetractStateFor(s: SparkSession, d: String): String =
    retractMaintained.computeIfAbsent(d, { _ =>
      import graft.operators.{Bm25Index, Packing}
      val corpus = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val chunks = Packing.chunkTokens(corpus, "doc_id", "text", 16, 0)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      val state = tmpDir("sretrstate", create = false).toString + "/state"
      Bm25Index.extendIndex(s, state, chunks,
        Seq("doc_id", "chunk_id"), "chunk_text", batchId = 0L)
      val dels = corpus.filter(pmod(col("doc_id"), lit(13)) === 3)
        .select(col("doc_id"))
      val cut = dels.agg(max(col("doc_id"))).head.getLong(0) / 2
      val srcDir = tmpDir("sretrsrc")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("sretrw")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(srcDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(dels.filter(col("doc_id") <= cut), "del_0.parquet", now - 60000)
      stage(dels.filter(col("doc_id") > cut), "del_1.parquet", now)
      val ckpt = tmpDir("sretrckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // versions 3b+1 (retract) / 3b+2 / 3b+3 (maintenance): monotone
          // and replay-safe, batch 0's retraction still lands above the
          // batch-0 full build's version 0
          Bm25Index.retractFromIndex(s, state, batch,
            Seq("doc_id", "chunk_id"), 3 * batchId + 1L)
          // both amortized maintenance schedules wired where a production
          // takedown pipeline runs them: after every retraction batch —
          // the VOLUME fold (fraction trigger plus an absolute row bound:
          // the 100 TB posture, where a huge index never trips a fraction
          // but the backlog must stay under the broadcast anti-join
          // ceiling) and the SEGMENT-COUNT fold (a long takedown stream
          // otherwise accumulates one small tombstone segment per batch
          // forever). One manifest read each decides; read-invisible when
          // they fire, so s29's serve ≡ recompute oracle gates either way.
          Bm25Index.compactIndexWhenDue(s, state, 3 * batchId + 2L,
            maxFraction = 0.2, maxTombRows = 2000000L)
          Bm25Index.compactIndexSegmentsWhenDue(s, state, 3 * batchId + 3L,
            maxSegments = 16)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      state
    })

  private val lifecycleMaintained =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The s33 FULL-LIFECYCLE stream, memoized per (JVM, sf dir): ingest
    * and takedown batches interleaved on ONE index state through one
    * foreachBatch loop — add(≤cut), del(%13 ≤cut), add(>cut),
    * del(%13 >cut) — with BOTH maintenance schedules running after every
    * batch (segment-count folds after adds; volume + segment folds after
    * deletes). The per-batch version stride (4b+1..4b+3) keeps every
    * commit monotone and replay-safe, and because all four mutations run
    * through the one serialized loop, the single-writer contract the
    * commit protocol enforces is exactly satisfied — two concurrent
    * streams on this state would raise, not clobber. The drained state's
    * serve must equal the from-scratch recompute over
    * (all docs) − (%13 block): e34's oracle verbatim. */
  private def streamedLifecycleStateFor(s: SparkSession, d: String): String =
    lifecycleMaintained.computeIfAbsent(d, { _ =>
      import graft.operators.{Bm25Index, Packing}
      val corpus = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) =!= 5)
        .select(col("doc_id"), col("text"))
      val chunks = Packing.chunkTokens(corpus, "doc_id", "text", 16, 0)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      val cut = corpus.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
      def adds(f: org.apache.spark.sql.Column) = chunks.filter(f)
        .select(lit("add").as("op"), col("doc_id"), col("chunk_id"),
          col("chunk_text"))
      def dels(f: org.apache.spark.sql.Column) = corpus.filter(f)
        .filter(pmod(col("doc_id"), lit(13)) === 3)
        .select(lit("del").as("op"), col("doc_id"),
          lit(null).cast("long").as("chunk_id"),
          lit(null).cast("string").as("chunk_text"))
      val srcDir = tmpDir("slifesrc")
      def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
        val tmp = tmpDir("slifew")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(srcDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(lastMod); ()
      }
      val now = System.currentTimeMillis()
      stage(adds(col("doc_id") <= cut), "b0_add.parquet", now - 180000)
      stage(dels(col("doc_id") <= cut), "b1_del.parquet", now - 120000)
      stage(adds(col("doc_id") > cut), "b2_add.parquet", now - 60000)
      stage(dels(col("doc_id") > cut), "b3_del.parquet", now)
      val state = tmpDir("slifestate", create = false).toString + "/state"
      val ckpt = tmpDir("slifeckpt")
      val stream = s.readStream
        .schema(s.read.parquet(srcDir.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt.toString)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // one op per staged file (maxFilesPerTrigger = 1); an empty
          // staged file (no matching docs at this SF) delivers an empty
          // batch — nothing to commit
          val op = batch.select(col("op")).distinct().collect()
            .map(_.getString(0)).toSeq
          require(op.length <= 1, s"mixed-op batch: $op")
          val base = 4 * batchId
          if (op.isEmpty) ()
          else if (op.head == "add") {
            Bm25Index.extendIndex(s, state,
              batch.select(col("doc_id"), col("chunk_id"),
                col("chunk_text")),
              Seq("doc_id", "chunk_id"), "chunk_text", base + 1)
            // budget 1 is deliberately tight: the b2 add leaves two
            // posting/item segments, so a REAL mid-stream fold fires
            // between the second add and the second delete
            Bm25Index.compactIndexSegmentsWhenDue(s, state, base + 2,
              maxSegments = 1)
          } else {
            Bm25Index.retractFromIndex(s, state,
              batch.select(col("doc_id")).distinct(),
              Seq("doc_id", "chunk_id"), base + 1)
            Bm25Index.compactIndexWhenDue(s, state, base + 2,
              maxFraction = 0.2, maxTombRows = 2000000L)
            // and the b3 delete leaves two tombstone segments per part,
            // so the tombstone-segment fold fires mid-stream too
            Bm25Index.compactIndexSegmentsWhenDue(s, state, base + 3,
              maxSegments = 1)
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      state
    })

  val defs: Map[String, Q] = Map(
    // --- s01: tumbling-window counts, streamed end to end. Complete output
    //     mode materializes every window, so the result equals the batch
    //     aggregation row for row. ------------------------------------------
    "s01_stream_windowed" -> ((s, d) => {
      withStatePartitions(s, 8) {
        drain(EventStreams.windowedCounts(eventsStream(s, d), "1 hour", "2 hours"),
          complete = true)
      }
        .select(unix_micros(col("window_start")).as("window_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_us", "event_type")
    }),

    // --- s02: foreachBatch ingest into the deterministic sharded layout
    //     (EventStreams.ingestSharded → Sinks.upsertSharded), then read the
    //     LAYOUT back and aggregate per shard. Proves the streamed sink
    //     state equals what a batch write of the same data produces —
    //     shard assignment (pmod(event_id, 16)) is replicated by the
    //     oracle's event_id % 16. --------------------------------------------
    "s02_stream_ingest" -> ((s, d) => {
      // the streamed ingest is one-time setup per (JVM, sf dir) — like the
      // q71/q74 sink writes — so repeat invocations time the layout read.
      // Built via the dedicated `ingested` map: the builder stages events
      // (the `staged` map), which must not happen inside a computeIfAbsent
      // on `staged` itself.
      val layout = ingested.computeIfAbsent(d, { _ =>
        val out = tmpDir("ingest", create = false)
        val ckpt = tmpDir("ckpt")
        val q = withStatePartitions(s, 8) { EventStreams.ingestSharded(
          eventsStream(s, d).select(col("event_id"), col("user_id"),
            col("event_type"), col("value")),
          out.toString, "event_id", 16, ckpt.toString) }
        try q.processAllAvailable() finally q.stop()
        out.toString
      })
      graft.sources.Sinks.readSharded(s, layout)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
        .orderBy("shard")
    }),

    // --- s05: stream-stream interval join (clicks ⋈ same-user views in the
    //     30-min lookback window). Inner joins emit a pair the moment both
    //     sides have arrived — the watermark only bounds STATE (evicting
    //     buffered views the click-side watermark has passed), never
    //     emission — so with every event in the staged input the emitted
    //     pair set equals the batch interval join, which is the oracle.
    //     Aggregate-compared (pair ids + sum invariants). --------------------
    "s05_stream_join" -> ((s, d) => {
      val joined = EventStreams.clickViewJoin(eventsStream(s, d),
        lookback = "30 minutes", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drainMode(joined, org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("click_id")).as("click_id_sum"),
          sum(col("view_id")).as("view_id_sum"),
          count_distinct(col("user_id")).as("n_users"))
    }),

    // --- s04: custom sessionization (flatMapGroupsWithState with event-time
    //     timeout). One staged file → one micro-batch, so in-batch
    //     processing closes every session but each user's last (exact
    //     gaps-and-islands semantics — the arrival-order caveat in
    //     EventStreams.customSessions is vacuous for a single batch); the
    //     post-batch no-data batch then flushes open sessions whose
    //     (end + gap) the final watermark passed. The oracle replicates
    //     both the session split and the emission set — in MILLISECONDS,
    //     because the state kernel works on Timestamp.getTime: gap checks,
    //     emitted bounds, and the timeout comparison all truncate micros
    //     to ms, and the watermark itself is tracked in ms. ------------------
    "s04_stream_sessions" -> ((s, d) => {
      import s.implicits._
      val ev = eventsStream(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[EventStreams.UserEvent]
      val sessions = EventStreams.customSessions(ev,
        gapMs = 30L * 60 * 1000, watermark = "1 hour")
      withStatePartitions(s, 8) {
        drainMode(sessions.toDF(),
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .select(col("user_id"),
          unix_millis(col("session_start")).as("start_ms"),
          unix_millis(col("session_end")).as("end_ms"),
          col("n_events"))
        .orderBy("user_id", "start_ms")
    }),

    // --- s06: per-user running counters via mapGroupsWithState — the
    //     remaining custom-state API surface (s04 covers flatMap...). One
    //     batch → one Update-mode row per user = the batch aggregate.
    //     total_value folds floats sequentially, so the compare is in
    //     integer ticks (each term is floor(v·1000)/1000; the tick sum is
    //     exact in both engines while the double's last ulp is not); the
    //     last-event order replicates the kernel's ms truncation. ------------
    "s06_stream_running" -> ((s, d) => {
      import s.implicits._
      val ev = eventsStream(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[EventStreams.UserEvent]
      withStatePartitions(s, 8) {
        drain(EventStreams.runningUserStats(ev).toDF(), complete = false)
      }
        .select(col("user_id"), col("n_events"),
          round(col("total_value") * 1000).cast("long").as("value_ticks"),
          col("last_type"))
        .orderBy("user_id")
    }),

    // --- s07: stream-stream LEFT OUTER join. Matched pairs equal the s05
    //     inner set; the outer (null-view) rows are exactly the unmatched
    //     clicks whose state the FINAL watermark evicted — clicks in the
    //     last watermark-horizon stay buffered at stream end and never
    //     emit, which the oracle replicates with the same ms-floored
    //     watermark arithmetic as s04. ---------------------------------------
    "s07_stream_left_join" -> ((s, d) => {
      val joined = EventStreams.clickViewLeftJoin(eventsStream(s, d),
        lookback = "30 minutes", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drainMode(joined, org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .agg(count(lit(1)).as("n_rows"),
          count(col("view_id")).as("n_matched"),
          sum(when(col("view_id").isNull, 1).otherwise(0)).cast("long")
            .as("n_unmatched"),
          sum(when(col("view_id").isNull, col("click_id"))).cast("long")
            .as("unmatched_click_id_sum"))
    }),

    // --- s16: stream-stream FULL OUTER join, completing the join-mode
    //     matrix (inner s05, left s07). The new semantics over s07 is the
    //     RIGHT side's outer rows: a view's state evicts only when the
    //     watermark passes view_ts + lookback (a later click could still
    //     join it until then), so its null-extended row needs a DEEPER
    //     final horizon than a click's — the oracle models both horizons
    //     in the same ms-floored watermark arithmetic as s04/s07. -----------
    "s16_stream_full_join" -> ((s, d) => {
      val joined = EventStreams.clickViewFullJoin(eventsStream(s, d),
        lookback = "30 minutes", watermark = "1 hour")
      withStatePartitions(s, 8) {
        drainMode(joined, org.apache.spark.sql.streaming.OutputMode.Append())
      }
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("click_id").isNotNull && col("view_id").isNotNull, 1))
            .as("n_matched"),
          sum(when(col("view_id").isNull, 1).otherwise(0)).cast("long")
            .as("n_unmatched_clicks"),
          sum(when(col("click_id").isNull, 1).otherwise(0)).cast("long")
            .as("n_unmatched_views"),
          sum(when(col("view_id").isNull, col("click_id"))).cast("long")
            .as("unmatched_click_id_sum"),
          sum(when(col("click_id").isNull, col("view_id"))).cast("long")
            .as("unmatched_view_id_sum"))
    }),

    // --- s08: streaming materialized-view maintenance — foreachBatch
    //     merges each micro-batch into the IncrementalAgg state (with the
    //     batch-id marker making replay idempotent), so the maintained
    //     view must equal the one-shot batch aggregate regardless of how
    //     the stream was batched. value is floor-quantized to ticks
    //     BEFORE the state (long in, exact decimal accumulate), keeping
    //     the replay hash-comparable. Setup is one-time per (JVM, sf) —
    //     repeat invocations time the state read, like s02. ------------------
    "s08_stream_mv" -> ((s, d) => {
      val state = mvMaintained.computeIfAbsent(d, { _ =>
        val path = tmpDir("mvstate", create = false).toString + "/state"
        val ckpt = tmpDir("mvckpt")
        val q = withStatePartitions(s, 8) {
          EventStreams.aggMaintain(
            eventsStream(s, d).select(col("event_type"),
              floor(col("value") * 1000).cast("long").as("value_ticks")),
            path, "event_type", "value_ticks", ckpt.toString)
        }
        try q.processAllAvailable() finally q.stop()
        path
      })
      graft.operators.IncrementalAgg.readState(s, state)
        .select(col("event_type"), col("cnt"),
          col("vsum").cast("double").as("ticks_sum"),
          col("vmax").as("ticks_max"))
        .orderBy("event_type")
    }),

    // --- s18: MV join-back SERVED UNDER STREAMING MAINTENANCE — the
    //     composition q104 (join-back rewrite) and s08 (foreachBatch
    //     maintenance) each prove half of. The orders fact arrives as a
    //     file stream (base file, then a delta file, one per micro-batch);
    //     each batch rolls up per o_custkey and merges into the MV state
    //     via MvMaintain under the exactly-once versioned commit, and the
    //     post-commit hook re-points the MvRewrite registration at the
    //     fresh version dir — so the fact⋈customer aggregate below is
    //     answered from the MAINTAINED summary + dim (no fact scan;
    //     PlansSpec pins it) at every instant between batches. Streamed
    //     base∪delta = the full orders table, so the oracle is q104's SQL
    //     over the raw tables: a dropped/double-merged delta row or a
    //     stale registration flips the hash. ------------------------------
    "s18_stream_mv_joinback" -> ((s, d) => {
      val rollups = Map("mv_sum_price" -> "sum", "mv_cnt" -> "sum",
        "mv_max_ok" -> "max")
      def rollup(df: DataFrame): DataFrame = df
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .as("mv_sum_price"),
          count(lit(1)).as("mv_cnt"),
          max(col("o_orderkey")).as("mv_max_ok"))
      def register(factPath: String, statePath: String): Unit = {
        graft.plans.MvRewrite.unregister(factPath)
        graft.operators.IncrementalAgg.latestStateDir(s, statePath)
          .foreach { vdir =>
            graft.plans.MvRewrite.register(s, factPath,
              rollup(s.read.parquet(factPath)), vdir,
              Seq("o_custkey"), rollups)
          }
      }
      val memo = mvJoinback.computeIfAbsent(d, { _ =>
        val fact = tmpDir("mvfact")
        val orders = Tables.orders(s, d)
        def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
          val tmp = tmpDir("mvfw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          val dest = new java.io.File(fact, name)
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.setLastModified(lastMod); ()
        }
        val now = System.currentTimeMillis()
        stage(orders.filter(pmod(col("o_orderkey"), lit(5)) =!= 0),
          "orders_base.parquet", now - 60000)
        stage(orders.filter(pmod(col("o_orderkey"), lit(5)) === 0),
          "orders_delta.parquet", now)
        val statePath = tmpDir("mvjbstate", create = false).toString + "/state"
        val ckpt = tmpDir("mvjbckpt")
        val factPath = fact.toString
        val stream = s.readStream
          .schema(s.read.parquet(factPath).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(factPath)
        val q = withStatePartitions(s, 8) {
          EventStreams.mvMaintain(stream, statePath, Seq("o_custkey"),
            rollup, rollups, ckpt.toString,
            // re-point the serving registration at the new immutable
            // version dir (the previous one is pruned by the commit)
            onRefresh = _ => register(factPath, statePath))
        }
        try q.processAllAvailable() finally q.stop()
        s"$factPath|$statePath"
      })
      val Array(factDir, statePath) = memo.split('|')
      // re-register on EVERY invocation: a registered MvDef binds a
      // relation to the session that registered it — a later session (the
      // shared test context is stopped and rebuilt mid-suite) must not
      // serve a relation bound to a dead SparkContext
      register(factDir, statePath)
      s.read.parquet(factDir)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"),
          max(col("o_orderkey")).as("max_orderkey"))
        .orderBy("c_mktsegment")
    }),

    // --- s19: STREAMING QUALITY ROUTING — the batch-trained d51
    //     classifier served in a document stream: each micro-batch scores
    //     row-locally (features + σ(w·x) are pure projections, weights
    //     broadcast as literals) and routes keep/reject to two parquet
    //     sinks via idempotent per-batch overwrite dirs
    //     (EventStreams.routeBinary — replay rewrites the same dir, no
    //     marker protocol). Gate: the streamed routing must EQUAL the
    //     batch routing of the same corpus with the SAME memoized weights
    //     (exact id-set equality — the d30/e18 equivalence shape), plus
    //     totality and disjointness. Constant-row oracle. ------------------
    "s19_stream_quality_routing" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val (featCols, w, _) = graft.queries.TextQueries.qualityModel(s, d)
      def score(df: DataFrame): DataFrame = {
        val withF = graft.operators.TextAnalysis
          .qualityFeatures(col("text"))
          .foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
        withF.withColumn("p",
          graft.operators.Classifier.logisticScore(featCols, w))
      }
      val memo = qualityRouted.computeIfAbsent(d, { _ =>
        val srcDir = tmpDir("qroutesrc")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        def stage(df: DataFrame, name: String): Unit = {
          val tmp = tmpDir("qroutew")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            new java.io.File(srcDir, name).toPath); ()
        }
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "docs_0.parquet")
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "docs_1.parquet")
        val keepDir = tmpDir("qroutekeep", create = false).toString
        val rejDir = tmpDir("qroutere", create = false).toString
        val ckpt = tmpDir("qrouteckpt")
        val stream = s.readStream
          .schema(s.read.parquet(srcDir.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        val q = EventStreams.routeBinary(
          score(stream).select(col("doc_id"), col("p")),
          col("p") > 0.5, keepDir, rejDir, ckpt.toString)
        try q.processAllAvailable() finally q.stop()
        s"$keepDir|$rejDir"
      })
      val Array(keepDir, rejDir) = memo.split('|')
      val streamedKeep = s.read.parquet(keepDir).select(col("doc_id"))
      val streamedRej = s.read.parquet(rejDir).select(col("doc_id"))
      val batchKeep = score(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
        .filter(col("p") > 0.5).select(col("doc_id"))
      val nDocs = Tables.documents(s, d).count()
      val overlap = streamedKeep.withColumn("in_s", lit(1))
        .join(batchKeep.withColumn("in_b", lit(1)), Seq("doc_id"), "full_outer")
      streamedKeep.unionAll(streamedRej)
        .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("nd"))
        .crossJoin(overlap.agg(
          bool_and(col("in_s").isNotNull && col("in_b").isNotNull)
            .as("equals_batch")))
        .select(
          (col("n") === lit(nDocs)).as("routed_all"),
          (col("nd") === lit(nDocs)).as("disjoint"),
          col("equals_batch"))
    }),

    // --- s20: streaming NEAR-DUP-SUPPRESSED corpus ingestion — the d30
    //     incremental-dedup step driven by foreachBatch with exactly-once
    //     semantics: each micro-batch dedups against the versioned MinHash
    //     signature state (and within itself, greedy by id), kept rows
    //     land in an idempotent per-batch overwrite dir BEFORE the
    //     signatures commit, so every crash point replays safely
    //     (Dedup.incrementalDedupOnce's crash matrix). Files are staged
    //     in monotone id order — the crawl-snapshot contract the
    //     incremental ≡ full-recompute equivalence needs. The streamed
    //     union of kept batches must equal d30's kept set (same corpus,
    //     same threshold), so the ORACLE IS d30's SQL verbatim. -------------
    "s20_stream_incremental_dedup" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val outDir = streamDedup.computeIfAbsent(d, { _ =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
        val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
        val srcDir = tmpDir("sdedupsrc")
        def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
          val tmp = tmpDir("sdedupw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          val dest = new java.io.File(srcDir, name)
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.setLastModified(lastMod); ()
        }
        val now = System.currentTimeMillis()
        stage(docs.filter(col("doc_id") <= cut), "snap_0.parquet", now - 60000)
        stage(docs.filter(col("doc_id") > cut), "snap_1.parquet", now)
        val statePath = tmpDir("sdedupstate", create = false).toString + "/state"
        val out = tmpDir("sdedupout", create = false).toString
        val ckpt = tmpDir("sdedupckpt")
        val stream = s.readStream
          .schema(s.read.parquet(srcDir.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // S-curve-solved banding (d06's near-certainty floor): the
            // oracle replays a full recompute, so candidates can't miss
            Dedup.incrementalDedupOnce(s, statePath, batch,
              "doc_id", "text", batchId,
              kept => kept.write.mode("overwrite")
                .parquet(s"$out/batch=$batchId"),
              bands = Dedup.lshParams(numHashes = 128,
                threshold = 0.8, recallFloor = 1 - 1e-7)._1)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        out
      })
      s.read.parquet(outDir)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // --- s21: streaming DOMAIN-CAPPED ingestion — d56's C4/RefinedWeb
    //     first stage driven by foreachBatch with the per-domain cap
    //     enforced ACROSS micro-batches: versioned (host, n_accepted)
    //     state, kept rows land in an idempotent per-batch overwrite dir
    //     BEFORE the counts commit (UrlCuration.domainCapOnce's crash
    //     matrix). Files are staged in monotone doc_id order — under
    //     which the streamed union of kept batches EQUALS the
    //     batch-global ARRIVAL-ORDER cap (row_number per host by
    //     doc_id), which the oracle replays in SQL. ----------------------
    "s21_stream_domain_cap" -> ((s, d) => {
      val outDir = streamDomcap.computeIfAbsent(d, { _ =>
        val urls = graft.queries.TextQueries.syntheticUrls(
          Tables.documents(s, d))
        val cut = urls.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
        val srcDir = tmpDir("sdomcapsrc")
        def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
          val tmp = tmpDir("sdomcapw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          val dest = new java.io.File(srcDir, name)
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.setLastModified(lastMod); ()
        }
        val now = System.currentTimeMillis()
        stage(urls.filter(col("doc_id") <= cut), "snap_0.parquet", now - 60000)
        stage(urls.filter(col("doc_id") > cut), "snap_1.parquet", now)
        val statePath = tmpDir("sdomcapstate", create = false).toString + "/state"
        val out = tmpDir("sdomcapout", create = false).toString
        val ckpt = tmpDir("sdomcapckpt")
        val stream = s.readStream
          .schema(s.read.parquet(srcDir.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            UrlCuration.domainCapOnce(s, statePath, batch,
              "doc_id", "url", batchId,
              kept => kept.write.mode("overwrite")
                .parquet(s"$out/batch=$batchId"),
              blocklist = Seq("blocked.example"), maxPerDomain = 10)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        out
      })
      s.read.parquet(outDir)
        .select(col("host"), col("doc_id"))
        .orderBy("host", "doc_id")
    }),

    // --- s22: streaming DECONTAMINATION gate — d12's benchmark-overlap
    //     removal served in-stream: the benchmark side (Bloom bytes +
    //     distinct shingle frame) is prepped ONCE before the stream
    //     starts, each micro-batch scores its docs with the Bloom
    //     prescreen + exact confirm join and routes keep/reject to
    //     idempotent per-batch overwrite dirs. Contamination is PLANTED
    //     (1-in-13 corpus docs get their 97-block's bench doc text, so
    //     both polarities exist at every SF). Scoring is stateless per
    //     doc ⇒ streamed keep union == batch decontaminate — the SQL
    //     oracle replays the planting + scoring + threshold. -------------
    "s22_stream_decontam_gate" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val keepDir = streamDecontam.computeIfAbsent(d, { _ =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 3)
        val anchors = bench.select(col("doc_id").as("a_id"),
          col("text").as("a_text"))
        val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 3)
          .withColumn("a_id",
            col("doc_id") - pmod(col("doc_id"), lit(97)) + 3)
          .join(anchors, Seq("a_id"), "left")
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(13)) === 5 && col("a_text").isNotNull,
              concat(col("a_text"), lit(" planted leak tail")))
              .otherwise(col("text")).as("text"),
            col("n_chars"))
        val cut = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val srcDir = tmpDir("sdecontamsrc")
        def stage(df: DataFrame, name: String, lastMod: Long): Unit = {
          val tmp = tmpDir("sdecontamw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          val dest = new java.io.File(srcDir, name)
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.setLastModified(lastMod); ()
        }
        val now = System.currentTimeMillis()
        stage(corpus.filter(col("doc_id") <= cut), "snap_0.parquet", now - 60000)
        stage(corpus.filter(col("doc_id") > cut), "snap_1.parquet", now)
        val keep = tmpDir("sdecontamkeep", create = false).toString
        val rej = tmpDir("sdecontamrej", create = false).toString
        val ckpt = tmpDir("sdecontamckpt")
        val (benchSh, bloomBytes) = graft.operators.Contamination
          .prepBenchmark(bench, "text")
        val benchCk = benchSh.localCheckpoint()
        try {
          val stream = s.readStream
            .schema(s.read.parquet(srcDir.toString).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(srcDir.toString)
          val q = EventStreams.decontamGate(stream, benchCk, bloomBytes,
            "doc_id", "text", keep, rej, ckpt.toString, threshold = 0.5)
          try q.processAllAvailable() finally q.stop()
        } finally Dedup.release(benchCk)
        keep
      })
      s.read.parquet(keepDir)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // --- s23: streaming SIGNAL-BUNDLE ingestion — d63's one-scan
    //     quality-signals table computed AT INGEST (how RedPajama-V2
    //     actually ships: signals ride along with the crawl, not as a
    //     later full-corpus pass): each micro-batch maps through the
    //     row-local signalBundle and lands in an idempotent per-batch
    //     overwrite dir (EventStreams.transformIngest — stateless, so
    //     exactly-once falls out of idempotence). Because the bundle is
    //     per-row, the streamed union over batches EQUALS the batch
    //     bundle of the full corpus — the ORACLE IS d63's SQL verbatim. ----
    "s23_stream_signal_ingest" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val sigDir = signalIngested.computeIfAbsent(d, { _ =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val srcDir = tmpDir("ssignalsrc")
        def stage(df: DataFrame, name: String): Unit = {
          val tmp = tmpDir("ssignalw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            new java.io.File(srcDir, name).toPath); ()
        }
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "docs_0.parquet")
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "docs_1.parquet")
        val out = tmpDir("ssignalout", create = false).toString
        val ckpt = tmpDir("ssignalckpt")
        val stream = s.readStream
          .schema(s.read.parquet(srcDir.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        val q = EventStreams.transformIngest(stream,
          b => graft.operators.TextAnalysis.signalBundle(b, "doc_id", "text"),
          out, ckpt.toString)
        try q.processAllAvailable() finally q.stop()
        out
      })
      s.read.parquet(sigDir).drop("batch").orderBy("doc_id")
    }),

    // --- s24: streamed DATASHEET maintenance — d65's dataset card kept
    //     LIVE while the corpus ingests: each micro-batch rolls up its
    //     leaf cells (datasheetCells — every measure an integer sum) and
    //     merges into versioned state via the exactly-once MvMaintain
    //     "sum" algebra, so at any commit the maintained card EQUALS the
    //     batch card over everything ingested. The oracle is d65's leaf
    //     GROUP BY — margins derive from cells and never ride the stream. --
    "s24_stream_datasheet" -> ((s, d) => {
      val rollups = Map("n_docs" -> "sum", "n_tokens" -> "sum",
        "n_chars" -> "sum", "n_quality_kept" -> "sum", "q_sum_fp" -> "sum")
      val statePath = datasheetMaintained.computeIfAbsent(d, { _ =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), col("text"))
        val srcDir = tmpDir("sdsheetsrc")
        def stage(df: DataFrame, name: String): Unit = {
          val tmp = tmpDir("sdsheetw")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            new java.io.File(srcDir, name).toPath); ()
        }
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "docs_0.parquet")
        stage(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "docs_1.parquet")
        val state = tmpDir("sdsheetstate", create = false).toString + "/state"
        val ckpt = tmpDir("sdsheetckpt")
        val stream = s.readStream
          .schema(s.read.parquet(srcDir.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        val q = withStatePartitions(s, 8) {
          EventStreams.mvMaintain(stream, state, Seq("source", "lang"),
            b => graft.operators.TextAnalysis.datasheetCells(
              b, "source", "lang", "text"),
            rollups, ckpt.toString)
        }
        try q.processAllAvailable() finally q.stop()
        state
      })
      // serve the FULL card (cells + ROLLUP margins + grouping flags)
      // from the maintained leaf-cell state alone — the oracle is d65's
      // complete rollup SQL, so a margin that fails to reconstruct from
      // cells flips the hash
      graft.operators.TextAnalysis.datasheetFromCells(
          graft.operators.IncrementalAgg.readState(s, statePath),
          "source", "lang")
        .orderBy(col("g_src"), col("g_lang"), col("source"), col("lang"))
    }),

    // --- s25: streamed RAG CHUNK-INDEX maintenance — e26's retrieval
    //     index kept live while the corpus ingests (the continuously-
    //     indexing RAG pipeline): each micro-batch chunks + embeds ONLY
    //     its own docs (chunking, hashed-BoW, and the norm are all
    //     row-local, so a delta's index rows are bit-identical to a full
    //     rebuild's — the e18/e20 fact) into idempotent per-batch dirs.
    //     After the drain, retrieval SERVED FROM the maintained index
    //     must equal the batch pipeline over everything ingested — the
    //     oracle is e26's SQL verbatim, so a chunk lost, re-embedded
    //     differently, or duplicated by the stream flips the hash. --------
    "s25_stream_chunk_index" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val idxDir = streamedChunkIndexFor(s, d)
      val queries = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      graft.operators.Similarity.chunkRetrieveFromIndex(
          s.read.parquet(idxDir).drop("batch"),
          queries, "doc_id", "text", k = 3)
        .orderBy("query_id", "rank")
    }),

    // --- s26: streamed BM25 POSTING-INDEX maintenance — the sparse twin
    //     of s25: e30's posting index kept live while the corpus ingests.
    //     Each micro-batch tokenizes ONLY its own chunks and merges under
    //     Bm25Index.extendIndex's exactly-once versioned commit (postings
    //     append under the monotone doc-id guard, df/len/n_docs ADD —
    //     files staged in monotone doc_id order, the crawl-snapshot
    //     contract, exactly s20's staging). After the drain, ranking
    //     SERVED from the maintained index must equal the from-scratch
    //     batch recompute over everything ingested — the ORACLE IS e30's
    //     SQL verbatim, so a chunk double-counted by an at-least-once
    //     replay, a df drift, or a stats miss flips the exact
    //     fixed-point scores. ------------------------------------------------
    "s26_stream_bm25_index" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val statePath = streamedBm25StateFor(s, d)
      val queries = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      graft.operators.Bm25Index.bm25TopKBatchFromIndex(s, statePath,
          queries, Seq("doc_id", "chunk_id"), "doc_id", "text", k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("chunk_id"), col("bm25_fp"))
        .orderBy("query_id", "rank")
    }),

    // --- s27: the LIVE RAG serving stack end to end — hybrid fusion over
    //     two STREAM-MAINTAINED indexes: the dense leg serves from s25's
    //     streamed chunk index, the sparse leg from s26's streamed posting
    //     index, fused with the same per-query RRF as e28/e31. Both legs'
    //     serving arithmetic is identical to the recompute paths', so the
    //     fused fixed-point output is hash-exact against the SAME
    //     from-scratch hybrid SQL as e28/e31 (shared verbatim) — a doc
    //     lost or duplicated by EITHER stream, in EITHER index, flips the
    //     hash. This is the composition a production deployment runs:
    //     ingest maintains both artifacts per micro-batch, serving never
    //     touches raw text. --------------------------------------------------
    "s27_stream_hybrid_serving" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      // both memo builders run their streams on first call per (JVM, sf)
      val denseDir = streamedChunkIndexFor(s, d)
      val bmState = streamedBm25StateFor(s, d)
      val queries = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      val dense = graft.operators.Similarity.chunkRetrieveFromIndex(
          s.read.parquet(denseDir).drop("batch"),
          queries, "doc_id", "text", k = 10)
        .select(col("query_id"), col("doc_id"), col("chunk_id"), col("rank"))
      val bm = graft.operators.Bm25Index.bm25TopKBatchFromIndex(s,
          bmState, queries,
          Seq("doc_id", "chunk_id"), "doc_id", "text", k = 10)
        .select(col("query_id"), col("doc_id"), col("chunk_id"), col("rank"))
      graft.operators.Similarity.rrfFusePerQuery(Seq(bm, dense), "query_id",
          Seq("doc_id", "chunk_id"), k = 5)
        .orderBy("query_id", "rrf_rank")
    }),

    // --- s28: streamed SCD TYPE-2 maintenance — the warehouse dimension
    //     kept live while the change log ingests: each micro-batch
    //     versions its own changes and merges through scdApply under the
    //     exactly-once versioned commit, with the EXACT at-tail guard
    //     (a per-key last-original-change markers part rides the same
    //     atomic commit — collapsed no-op changes included). The drained
    //     state must equal the one-shot history over ALL events — the
    //     ORACLE IS q110's SQL verbatim, so a version lost, split, or
    //     double-applied by the stream flips the hash. --------------------
    "s28_stream_scd2" -> ((s, d) => {
      val state = streamedScd2StateFor(s, d)
      graft.operators.IncrementalAgg.readStatePart(s, state, "dim")
        .select(col("user_id"), col("version"), col("event_type"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("is_current"), col("change_id"))
        .orderBy("user_id", "version")
    }),

    // --- s29: STREAMED takedown — deletion requests arriving as
    //     micro-batches, each retracting from the live posting index in
    //     place under the versioned commit (the ingest/takedown symmetry:
    //     s26 grows the index per batch, s29 shrinks it per batch). After
    //     the drain, serving must equal the from-scratch recompute over
    //     the SURVIVING corpus — the ORACLE IS e34's SQL verbatim, so a
    //     half-applied delete batch, a double-subtracted df, or a stats
    //     drift flips the exact fixed-point scores. ----------------------
    "s29_stream_takedown" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val state = streamedRetractStateFor(s, d)
      val queries = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      graft.operators.Bm25Index.bm25TopKBatchFromIndex(s, state,
          queries, Seq("doc_id", "chunk_id"), "doc_id", "text", k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("chunk_id"), col("bm25_fp"))
        .orderBy("query_id", "rank")
    }),

    // --- s30: STREAMED first-touch funnel — q113's anchors kept live in
    //     32-byte-per-user mapGroupsWithState state while events ingest
    //     in ts order (two monotone staged halves): anchors only move
    //     unset → set, so the drained state equals the batch funnel
    //     exactly. Update-mode sink holds one row per (user, batch-with-
    //     input); anchors are monotone, so max(struct) per user IS the
    //     final state. Oracle IS q113's SQL verbatim — an anchor set
    //     early, late, or twice by the stream flips the hash. -------------
    "s30_stream_funnel" -> ((s, d) => {
      import s.implicits._
      val srcDir = funnelStagedDirFor(s, d)
      val stream = s.readStream
        .schema(s.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("event_id"), col("event_type"))
        .as[EventStreams.FunnelEvent]
      val anchors = EventStreams.streamingFunnel(stream,
        Seq("view", "click", "purchase"), gapMicros = 7200000000L)
      withStatePartitions(s, 8) {
        drain(anchors.toDF(), complete = false)
      }
        .groupBy(col("user_id"))
        .agg(max(struct(col("t1_us"), col("t2_us"), col("t3_us")))
          .as("__st"))
        .filter(col("__st.t1_us") >= 0)
        .select(col("user_id"),
          col("__st.t1_us").as("t1_us"),
          when(col("__st.t2_us") >= 0, col("__st.t2_us")).as("t2_us"),
          when(col("__st.t3_us") >= 0, col("__st.t3_us")).as("t3_us"),
          (lit(1L) + when(col("__st.t2_us") >= 0, 1L).otherwise(0L) +
            when(col("__st.t3_us") >= 0, 1L).otherwise(0L))
            .as("steps_completed"))
        .orderBy("user_id")
    }),

    // --- s31: STREAMED retention cohorts — q114's matrix maintained in
    //     16-byte-per-user state (cohort day + a 63-bit active-offset
    //     bitmap; both MONOTONE, so the Update-sink collapses with a
    //     plain max). Shares s30's ts-monotone staged halves; the rollup
    //     explodes set bits into (cohort, offset) cells. Oracle IS
    //     q114's SQL verbatim — a day missed, double-set, or attributed
    //     to the wrong cohort flips the hash. ----------------------------
    "s31_stream_retention" -> ((s, d) => {
      import s.implicits._
      val srcDir = funnelStagedDirFor(s, d)
      val days = s.readStream
        .schema(s.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .select(col("user_id"),
          unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .as[EventStreams.DayEvent]
      val states = EventStreams.streamingRetention(days)
      withStatePartitions(s, 8) {
        drain(states.toDF(), complete = false)
      }
        .groupBy(col("user_id"))
        .agg(max(struct(col("cohort_us"), col("offsets"))).as("__st"))
        .select(col("__st.cohort_us").as("cohort_us"),
          explode(expr(
            "filter(sequence(0L, 62L), i -> (shiftright(__st.offsets, cast(i as int)) & 1) = 1)"))
            .as("day_offset"))
        .groupBy(col("cohort_us"), col("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_us", "day_offset")
    }),

    // --- s32: STREAMED cached serving — the e39 result cache kept live
    //     across query micro-batches: batch 0 (first half of the query
    //     set) populates, batch 1 (the FULL set) resolves the first half
    //     as cross-batch cache HITS and serves only the second half from
    //     the index; per-batch output dirs are idempotent and the cache
    //     append no-ops on replay. Batch 1's output must equal the
    //     one-shot batch serve — the ORACLE IS e30's SQL verbatim, so a
    //     stale hit, a lost entry, or a double-served query flips the
    //     exact fixed-point scores. -------------------------------------
    "s32_stream_cached_serving" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val out = streamedCachedServeFor(s, d)
      s.read.parquet(s"$out/b1")
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("chunk_id"), col("bm25_fp"))
        .orderBy("query_id", "rank")
    }),

    // --- s33: the FULL index lifecycle in ONE stream — ingest and
    //     takedown batches interleaved on one state (add, del, add, del)
    //     through one serialized foreachBatch loop, with BOTH maintenance
    //     schedules (segment-count folds + volume folds) running after
    //     every batch. This is the composition a production deployment
    //     actually runs on one index: s26's grow, s29's shrink, and the
    //     round's maintenance, under the single-writer contract the
    //     commit protocol now enforces. The drained state serves against
    //     e34's oracle VERBATIM — a delete applied before its doc
    //     arrived, an add lost across a fold, or a stats drift anywhere
    //     in the interleaving flips the exact fixed-point scores. -------
    "s33_stream_lifecycle" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val state = streamedLifecycleStateFor(s, d)
      val queries = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(101)) === 5)
        .select(col("doc_id"), col("text"))
      graft.operators.Bm25Index.bm25TopKBatchFromIndex(s, state,
          queries, Seq("doc_id", "chunk_id"), "doc_id", "text", k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("chunk_id"), col("bm25_fp"))
        .orderBy("query_id", "rank")
    }),

    // --- s03: streaming exact dedup. The staged dir holds TWO copies of
    //     the events file; dropDuplicatesWithinWatermark on event_id must
    //     collapse them back to the original table (aggregate-compared). ----
    "s03_stream_dedup" -> ((s, d) => {
      val deduped = EventStreams.streamingDedup(
        eventsStream(s, d, copies = 2), "ts", Seq("event_id"),
        watermark = "10 hours", exact = true)
      withStatePartitions(s, 8) {
        drain(deduped, complete = false)
      }
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("event_id")).as("n_ids"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
    }),

    // --- s09: streaming dedup, DIGEST mode — the 100 TB path. State keys
    //     are two independent xxhash64 halves of the FULL payload (16 bytes
    //     per event regardless of payload width), vs s03's exact mode
    //     whose state grows with the payload. Same two-copy staged input,
    //     same oracle shape: the digests of identical rows collide by
    //     construction, so the stream collapses back to the original
    //     table (a false merge needs a 128-bit collision; see
    //     EventStreams.streamingDedup scaladoc for the birthday bound). ------
    "s09_stream_dedup_digest" -> ((s, d) => {
      val deduped = EventStreams.streamingDedup(
        eventsStream(s, d, copies = 2), "ts",
        Seq("event_id", "user_id", "event_type", "value"),
        watermark = "10 hours", exact = false)
      withStatePartitions(s, 8) {
        drain(deduped, complete = false)
      }
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("event_id")).as("n_ids"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
    }),

    // --- s10: built-in session windows — the DECLARATIVE sessionization
    //     (groupBy(session_window(ts, gap))), complementing s04's custom
    //     flatMapGroupsWithState kernel. Complete mode materializes every
    //     session, so the result equals batch gaps-and-islands — in native
    //     MICROSECONDS (the built-in merges on TimestampType directly; no
    //     ms truncation anywhere, unlike the custom kernel's
    //     Timestamp.getTime state). Spark's merge bound is STRICT (an
    //     event exactly gap after its predecessor starts a NEW session:
    //     merge iff next.start < window.end), which the oracle replicates
    //     with a `>= gap` split. Emitted end = last event + gap. ------------
    "s10_stream_session_window" -> ((s, d) => {
      val sess = eventsStream(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      withStatePartitions(s, 8) {
        drain(sess, complete = true)
      }
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    }),

    // --- s11: stream-STATIC enrichment join — the stateless production
    //     pattern (per-event dimension lookup: every micro-batch hash-joins
    //     against the dim with NO state store; contrast s05/s07, which buy
    //     stream-stream semantics with watermark-bounded state). The dim is
    //     broadcast — at 100 TB a small dim stays broadcast and a big dim
    //     pre-buckets on the join key (q90's layout); the stream side never
    //     shuffles for the join either way. Aggregate-compared to the batch
    //     join; value in exact ticks (see s03). --------------------------------
    "s11_stream_static_join" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = eventsStream(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
      withStatePartitions(s, 8) {
        drain(enriched, complete = true)
      }
        .orderBy("c_mktsegment")
    }),

    // --- s13: built-in streaming dedup — dropDuplicatesWithinWatermark,
    //     the declarative counterpart to s03/s09's custom kernel (same
    //     two-copy staged input, same oracle: the stream collapses back to
    //     the base table). The built-in keys state on the dedup columns
    //     and evicts on the watermark exactly like the custom path; what
    //     it adds is engine-managed state encoding — what it lacks is
    //     s09's digest mode, which is why the custom kernel also exists. --
    "s13_stream_dedup_builtin" -> ((s, d) => {
      val deduped = eventsStream(s, d, copies = 2)
        .withWatermark("ts", "10 hours")
        .dropDuplicatesWithinWatermark("event_id")
      withStatePartitions(s, 8) {
        drain(deduped, complete = false)
      }
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("event_id")).as("n_ids"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
    }),

    // --- s15: streaming KLL-sketch maintenance — the q101 quantile
    //     sketches kept CURRENT as events stream in. Each micro-batch's
    //     per-type sketches are unioned into a persisted ~KB state
    //     (idempotent foreachBatch, batchId markers), so "p50/p90 per
    //     type, so far" is answerable at any moment without replaying the
    //     stream — the online half of the q98/q101 sketch-as-storage
    //     family. Gate = q101's rank-bound contract: each quantile read
    //     off the MAINTAINED state is an exact data value whose true rank
    //     sits within ±3% (KLL k=200's 99% bound ×2), however the stream
    //     happened to batch. State build is one-time per (JVM, sf);
    //     repeat invocations time the state read, like s08. -----------------
    "s15_stream_sketch" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.kllQuantile
      val state = sketchMaintained.computeIfAbsent(d, { _ =>
        val path = tmpDir("skstate", create = false).toString + "/state"
        val ckpt = tmpDir("skckpt")
        val q = withStatePartitions(s, 8) {
          EventStreams.sketchMaintain(
            eventsStream(s, d).select(col("event_type"), col("value")),
            path, "event_type", "value", ckpt.toString)
        }
        try q.processAllAvailable() finally q.stop()
        path
      })
      // one gate definition shared with q101 — batch-built and
      // streaming-maintained sketches answer to the same contract
      ExpressionQueries.kllRankGate(s, d,
        graft.operators.IncrementalAgg.readState(s, state)
        .select(col("event_type"),
          kllQuantile(col("sk"), 0.10).as("e10"),
          kllQuantile(col("sk"), 0.50).as("e50"),
          kllQuantile(col("sk"), 0.90).as("e90")))
    }),

    // --- s17: streaming heavy-hitter maintenance — d43's frequent-items
    //     sketch kept current as events stream in (the online half of the
    //     d43/s15 sketch pair: s15 maintains quantiles, s17 the heavy
    //     tail). The per-batch union preserves Misra-Gries' guarantees
    //     under ANY batching, so the gate asserts them on the MAINTAINED
    //     state against batch-exact counts: no false negatives above the
    //     combined error bound, [lb,ub] bracketing, bounded state. The
    //     uniform user stream needs PLANTED hot terms (every %50==0
    //     event contributes 200 copies, family ordinal alternating
    //     hot_0/hot_1) or the report is empty and the gate vacuous —
    //     the d43 calibration. ---------------------------------------------
    "s17_stream_heavyhitters" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.{freqItems, freqMaxError}
      def withPlants(ev: DataFrame): DataFrame =
        ev.select(lit("g").as("k"),
            concat(lit("u"), col("user_id")).as("term"))
          .unionAll(ev.filter(pmod(col("event_id"), lit(50)) === 0)
            .select(lit("g").as("k"),
              explode(array_repeat(concat(lit("hot_"),
                pmod(expr("event_id div 50"), lit(2))), 200)).as("term")))
      val state = freqMaintained.computeIfAbsent(d, { _ =>
        val path = tmpDir("fhstate", create = false).toString + "/state"
        val ckpt = tmpDir("fhckpt")
        val q = withStatePartitions(s, 8) {
          EventStreams.freqMaintain(withPlants(eventsStream(s, d)),
            path, "k", "term", maxMapSize = 32, ckpt.toString)
        }
        try q.processAllAvailable() finally q.stop()
        path
      })
      val merged = graft.operators.IncrementalAgg.readState(s, state)
        .select(freqItems(col("sk")).as("items"),
          freqMaxError(col("sk")).as("maxerr"))
      val exact = withPlants(Tables.events(s, d))
        .groupBy("term").agg(count(lit(1)).as("c"))
      exact.crossJoin(broadcast(merged))
        .withColumn("it", try_element_at(
          filter(col("items"), x => x.getField("term") === col("term")), lit(1)))
        .agg(
          bool_and(col("c") <= col("maxerr") || col("it").isNotNull)
            .as("no_false_neg"),
          bool_and(col("it").isNull ||
            (col("it").getField("lb") <= col("c") &&
              col("c") <= col("it").getField("ub"))).as("bounds_ok"),
          (max(when(col("c") > col("maxerr"), 1).otherwise(0)) === 1)
            .as("has_heavy"),
          (max(size(col("items"))) <= 32).as("state_bounded"))
    }),

    // --- s14: per-user running counters on Spark 4's transformWithState
    //     (the arbitrary-stateful API replacing mapGroupsWithState: typed
    //     state handles, per-state TTL, timers, RocksDB-backed store so
    //     keyed state is disk-bound, not heap-bound — the 100 TB-keys
    //     path). Bit-identical semantics to s06's mapGroupsWithState
    //     kernel, so both rows share one oracle; TWS requires the RocksDB
    //     provider, set for this query and restored after. ------------------
    "s14_stream_running_tws" -> ((s, d) => {
      import s.implicits._
      val ev = eventsStream(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[EventStreams.UserEvent]
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try withStatePartitions(s, 8) {
        drain(EventStreams.runningUserStatsTws(ev).toDF(), complete = false)
      }
        .select(col("user_id"), col("n_events"),
          round(col("total_value") * 1000).cast("long").as("value_ticks"),
          col("last_type"))
        .orderBy("user_id")
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // --- s12: Trigger.AvailableNow catch-up — the SCHEDULED-batch
    //     streaming pattern: the query rate-limits through the backlog
    //     (maxFilesPerTrigger batches, checkpointed offsets) and then
    //     STOPS ON ITS OWN, unlike processAllAvailable which needs an
    //     external supervisor. At 100 TB this is how periodic ingest runs:
    //     a cron-launched job drains exactly the pending files with
    //     bounded per-batch memory, exits, and the next launch resumes
    //     from the checkpoint. The sink is the parquet file sink
    //     (exactly-once via the sink log); the gate aggregates the landed
    //     layout against the batch oracle, so dropped or double-processed
    //     files flip the hash. StreamingSpec drives the two-launch
    //     backlog-then-resume scenario. --------------------------------------
    "s12_stream_availablenow" -> ((s, d) => {
      val layout = ingested.computeIfAbsent(s"$d#availablenow", { _ =>
        val srcDir = tmpDir("an_src")
        // fragment the backlog so the catch-up actually paces: 8 files at
        // 2 files/batch → 4 micro-batches before self-termination
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .repartition(8).write.mode("overwrite").parquet(srcDir.toString)
        val outDir = tmpDir("an_out", create = false)
        val ckpt = tmpDir("an_ckpt")
        val schema = s.read.parquet(srcDir.toString).schema
        val q = withStatePartitions(s, 8) {
          s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2).parquet(srcDir.toString)
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .format("parquet").option("path", outDir.toString)
            .start()
        }
        q.awaitTermination() // AvailableNow self-terminates when caught up
        outDir.toString
      })
      s.read.parquet(layout)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          (sum(floor(col("value") * 1000).cast("long")).cast("double") / 1000)
            .as("sum_value"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    // streamed monotone batches ≡ d30's two-snapshot replay ≡ the full
    // greedy dedup — so the oracle IS d30's SQL, shared verbatim
    "s20_stream_incremental_dedup" ->
      graft.queries.TextQueries.oracle("d30_incremental_dedup"),
    // per-batch chunk+embed is row-local, so the streamed-maintained
    // index serves retrieval identical to the batch pipeline — the
    // oracle IS e26's SQL, shared verbatim
    "s25_stream_chunk_index" ->
      graft.queries.TextQueries.oracle("e26_chunk_retrieval"),
    // per-batch tokenization is row-local and the posting/df/len merges
    // are additive, so the stream-maintained index serves ranking
    // identical to the from-scratch batch recompute — the oracle IS
    // e30's SQL (the exact-rational BM25 chain), shared verbatim
    "s26_stream_bm25_index" ->
      graft.queries.TextQueries.oracle("e30_bm25_index_served"),
    // caching is output-invisible and per-query results are independent,
    // so batch 1 (the FULL query set served through the cache — first
    // half cross-batch hits, second half misses) must equal the one-shot
    // batch serve — the oracle IS e30's SQL, shared verbatim
    "s32_stream_cached_serving" ->
      graft.queries.TextQueries.oracle("e30_bm25_index_served"),
    // both stream-maintained legs reproduce the exact rankings (dense:
    // row-local chunk+embed per batch; sparse: additive posting merge),
    // so the fused fixed-point output equals the from-scratch hybrid
    // chain — the oracle IS e28/e31's SQL, shared verbatim
    "s27_stream_hybrid_serving" ->
      graft.queries.TextQueries.oracle("e31_hybrid_served"),
    // monotone ts-split batches through scdApply's at-tail merge ≡ the
    // one-shot SCD-2 history — the oracle IS q110's SQL verbatim
    "s28_stream_scd2" ->
      graft.queries.RelationalQueries.oracle("q110_scd2_apply"),
    // micro-batched retractions ≡ one-shot retraction ≡ the recompute
    // over the surviving corpus — the oracle IS e34's SQL verbatim
    "s29_stream_takedown" ->
      graft.queries.TextQueries.oracle("e34_bm25_retract"),
    // interleaved grow/shrink/maintain on one state drains to exactly
    // the surviving corpus — the oracle IS e34's SQL verbatim
    "s33_stream_lifecycle" ->
      graft.queries.TextQueries.oracle("e34_bm25_retract"),
    // ts-monotone batches through the unset→set anchor fold ≡ the batch
    // first-touch funnel — the oracle IS q113's SQL verbatim
    "s30_stream_funnel" ->
      graft.queries.RelationalQueries.oracle("q113_funnel"),
    // monotone cohort + grow-only bitmap per user ≡ the batch cohort
    // matrix — the oracle IS q114's SQL verbatim
    "s31_stream_retention" ->
      graft.queries.RelationalQueries.oracle("q114_retention_cohorts"),
    // streamed monotone batches with cross-batch (host, n_accepted) state
    // ≡ the batch-global ARRIVAL-ORDER cap: row_number per host by doc_id
    // (NOT d56's hash-priority rank — the streamed cap keeps the first
    // arrivals). Same synthesized URLs, same host regex, same
    // registrable-granularity blocklist as d56's oracle.
    "s21_stream_domain_cap" ->
      """WITH urls AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
             || (CASE WHEN doc_id % 9 = 4 THEN 'crawler:pw@' ELSE '' END)
             || (CASE WHEN doc_id % 100 < 40 THEN 'cdn.bigfarm.example'
                      WHEN doc_id % 100 < 55 THEN 'Assets.BigFarm.Example'
                      WHEN doc_id % 100 < 63 THEN 'spam.blocked.example'
                      WHEN doc_id % 100 < 70 THEN 'blocked.example'
                      ELSE 'site' || CAST(doc_id % 17 AS VARCHAR) || '.example'
                 END)
             || (CASE WHEN doc_id % 7 = 3 THEN ':8080' ELSE '' END)
             || '/p/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
         h AS (
           SELECT doc_id,
             regexp_extract(lower(url),
               '^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)', 1) AS host
           FROM urls),
         kept AS (
           SELECT doc_id, host FROM h
           WHERE NOT (host = 'blocked.example'
                      OR host LIKE '%.blocked.example')),
         r AS (
           SELECT host, doc_id,
             row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk
           FROM kept)
         SELECT host, doc_id FROM r WHERE rk <= 10
         ORDER BY host, doc_id""",
    // stateless per-doc scoring ⇒ streamed keep union == batch
    // decontaminate; the oracle replays the planting (97-block bench
    // anchor text + tail), d12's string-shingle scoring, and the
    // threshold — kept docs only
    "s22_stream_decontam_gate" ->
      """WITH base AS (SELECT doc_id, text, n_chars FROM documents),
         bench0 AS (SELECT doc_id, text FROM base WHERE doc_id % 97 = 3),
         corp0 AS (
           SELECT b.doc_id,
             CASE WHEN b.doc_id % 13 = 5 AND a.text IS NOT NULL
                  THEN a.text || ' planted leak tail' ELSE b.text END AS text,
             b.n_chars
           FROM base b LEFT JOIN bench0 a
             ON a.doc_id = b.doc_id - (b.doc_id % 97) + 3
           WHERE b.doc_id % 97 <> 3),
         tokb AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                    t -> t <> '') AS toks FROM bench0),
         shb AS (SELECT CASE WHEN len(toks) >= 3
                   THEN list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   ELSE [] END AS sh FROM tokb),
         bsh AS (SELECT DISTINCT unnest(sh) AS s FROM shb),
         tokc AS (SELECT doc_id, n_chars,
                    list_filter(regexp_split_to_array(lower(text), '\s+'),
                      t -> t <> '') AS toks FROM corp0),
         shc AS (SELECT doc_id, n_chars, CASE WHEN len(toks) >= 3
                   THEN list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   ELSE [] END AS sh FROM tokc),
         corp AS (SELECT doc_id, unnest(sh) AS s FROM shc),
         hits AS (SELECT c.doc_id, count(*) AS n_sh, count(b.s) AS n_m
                  FROM corp c LEFT JOIN bsh b ON c.s = b.s
                  GROUP BY c.doc_id),
         scored AS (SELECT s.doc_id, s.n_chars,
             CASE WHEN COALESCE(h.n_sh, 0) > 0
               THEN CAST(h.n_m AS DOUBLE) / h.n_sh
               ELSE CAST(0 AS DOUBLE) END AS c
           FROM shc s LEFT JOIN hits h USING (doc_id))
         SELECT doc_id, n_chars FROM scored WHERE c < 0.5
         ORDER BY doc_id""",
    // integer-sum algebra ⇒ the maintained cells equal the batch cells,
    // and the served card reconstructs margins from them
    // (datasheetFromCells) — so the oracle is d65's COMPLETE rollup SQL
    "s24_stream_datasheet" ->
      """WITH t AS (
           SELECT doc_id, source, lang, text,
                  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
         f AS (
           SELECT doc_id, source, lang,
             CAST(len(toks) AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc,
             len(toks) AS n_tokens,
             CASE WHEN length(text) > 0
               THEN floor(CAST(length(text) - length(regexp_replace(text, '[\p{P}]', '', 'g')) AS DOUBLE)
                          / length(text) * 10000) / 10000
               ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
             CASE WHEN length(text) > 0
               THEN floor(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                          / length(text) * 10000) / 10000
               ELSE CAST(0 AS DOUBLE) END AS digit_ratio,
             CASE WHEN len(toks) > 0
               THEN floor(CAST(len(list_filter(toks, x -> x IN
                      ('the','and','of','to','a','in','is','it','that','for','on',
                       'with','as','was','at','by','an','be','this','are','or','from')))
                    AS DOUBLE) / len(toks) * 10000) / 10000
               ELSE CAST(0 AS DOUBLE) END AS stopword_ratio
           FROM t),
         q AS (
           SELECT source, lang, nt, nc,
             floor(((CASE WHEN n_tokens BETWEEN 10 AND 100000
                       THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
               + (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE)))
               + (1 - least(digit_ratio * 4, CAST(1 AS DOUBLE)))
               + least(stopword_ratio * 4, CAST(1 AS DOUBLE))) / 4 * 10000) / 10000
               AS qs
           FROM f)
         SELECT source, lang,
           CAST(GROUPING(source) AS INT) AS g_src,
           CAST(GROUPING(lang) AS INT) AS g_lang,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN qs >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_kept,
           CAST(sum(CAST(floor(qs * 10000) AS BIGINT)) AS BIGINT) AS q_sum_fp
         FROM q
         GROUP BY ROLLUP (source, lang)
         ORDER BY g_src, g_lang, source, lang""",

    // stateless per-row bundle ⇒ streamed union over batches == the batch
    // signals table: the oracle IS d63's SQL verbatim
    "s23_stream_signal_ingest" ->
      graft.queries.TextQueries.oracle("d63_signal_bundle"),
    // streamed routing ≡ batch routing with the shared memoized weights —
    // an in-row equivalence proof, so the oracle is the constant row
    "s19_stream_quality_routing" ->
      """SELECT true AS routed_all, true AS disjoint,
                true AS equals_batch""",
    // streamed base∪delta files = the full orders table, and the
    // maintained MV must serve the join-back exactly — so the oracle is
    // q104's SQL over the raw tables
    "s18_stream_mv_joinback" ->
      """SELECT c_mktsegment,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_price,
              count(*) AS n_orders,
              max(o_orderkey) AS max_orderkey
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",
    "s01_stream_windowed" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS window_us,
                event_type, count(*) AS n,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_us, event_type""",
    "s02_stream_ingest" ->
      """SELECT CAST(event_id % 16 AS BIGINT) AS shard, count(*) AS n_events,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events GROUP BY shard ORDER BY shard""",
    // the emitted pair set of a streaming inner interval join equals the
    // batch interval join over the same events (watermarks bound state,
    // not emission); µs comparisons agree because both engines read the
    // nanos parquet timestamp truncated to micros
    "s05_stream_join" ->
      """SELECT count(*) AS n_pairs,
                CAST(sum(c.event_id) AS BIGINT) AS click_id_sum,
                CAST(sum(v.event_id) AS BIGINT) AS view_id_sum,
                count(DISTINCT c.user_id) AS n_users
         FROM events c JOIN events v
           ON c.event_type = 'click' AND v.event_type = 'view'
          AND c.user_id = v.user_id
          AND v.ts <= c.ts
          AND v.ts >= c.ts - INTERVAL 30 MINUTE""",
    // matched pairs are watermark-independent (same as s05); the outer
    // rows are unmatched clicks with event time strictly before the FINAL
    // GLOBAL watermark — which is the MIN across the two withWatermark
    // columns (each: per-side max event time floored to ms, minus the 1 h
    // delay; Spark's multipleWatermarkPolicy defaults to min) — since a
    // click's null-extension can only emit once no earlier-timestamped
    // view can still arrive. Clicks inside the final horizon stay
    // buffered at stream end and never emit (1 of 2006 clicks at sf0.01;
    // at sf0.001 the min-vs-max distinction itself is load-bearing — the
    // sides' maxima differ by minutes and the max-based model overcounts
    // evictions by one).
    // per-side final horizons: clicks evict at the plain 1 h watermark
    // (same as s07); views only once the watermark passes
    // view_ts + 30 min, so their null rows need wm − 30 min
    "s16_stream_full_join" ->
      """WITH wm AS (SELECT least(
             (SELECT max(epoch_us(ts)) // 1000 FROM events
              WHERE event_type = 'click'),
             (SELECT max(epoch_us(ts)) // 1000 FROM events
              WHERE event_type = 'view')) * 1000 - 3600000000 AS wm_us),
         pairs AS (
           SELECT c.event_id AS click_id, v.event_id AS view_id
           FROM events c JOIN events v
             ON c.event_type = 'click' AND v.event_type = 'view'
            AND c.user_id = v.user_id AND v.ts <= c.ts
            AND v.ts >= c.ts - INTERVAL 30 MINUTE),
         uc AS (
           SELECT c.event_id AS click_id FROM events c, wm
           WHERE c.event_type = 'click'
             AND epoch_us(c.ts) < wm.wm_us
             AND NOT EXISTS (SELECT 1 FROM events v
                             WHERE v.event_type = 'view'
                               AND v.user_id = c.user_id
                               AND v.ts <= c.ts
                               AND v.ts >= c.ts - INTERVAL 30 MINUTE)),
         uv AS (
           SELECT v.event_id AS view_id FROM events v, wm
           WHERE v.event_type = 'view'
             AND epoch_us(v.ts) < wm.wm_us - 1800000000
             AND NOT EXISTS (SELECT 1 FROM events c
                             WHERE c.event_type = 'click'
                               AND c.user_id = v.user_id
                               AND v.ts <= c.ts
                               AND v.ts >= c.ts - INTERVAL 30 MINUTE))
         SELECT (SELECT count(*) FROM pairs) + (SELECT count(*) FROM uc)
                  + (SELECT count(*) FROM uv) AS n_rows,
                (SELECT count(*) FROM pairs) AS n_matched,
                (SELECT count(*) FROM uc) AS n_unmatched_clicks,
                (SELECT count(*) FROM uv) AS n_unmatched_views,
                (SELECT CAST(sum(click_id) AS BIGINT) FROM uc)
                  AS unmatched_click_id_sum,
                (SELECT CAST(sum(view_id) AS BIGINT) FROM uv)
                  AS unmatched_view_id_sum""",

    "s07_stream_left_join" ->
      """WITH wm AS (SELECT least(
             (SELECT max(epoch_us(ts)) // 1000 FROM events
              WHERE event_type = 'click'),
             (SELECT max(epoch_us(ts)) // 1000 FROM events
              WHERE event_type = 'view')) * 1000 - 3600000000 AS wm_us),
         pairs AS (
           SELECT c.event_id AS click_id, v.event_id AS view_id
           FROM events c JOIN events v
             ON c.event_type = 'click' AND v.event_type = 'view'
            AND c.user_id = v.user_id AND v.ts <= c.ts
            AND v.ts >= c.ts - INTERVAL 30 MINUTE),
         unmatched AS (
           SELECT c.event_id AS click_id FROM events c, wm
           WHERE c.event_type = 'click'
             AND epoch_us(c.ts) < wm.wm_us
             AND NOT EXISTS (SELECT 1 FROM events v
                             WHERE v.event_type = 'view'
                               AND v.user_id = c.user_id
                               AND v.ts <= c.ts
                               AND v.ts >= c.ts - INTERVAL 30 MINUTE))
         SELECT (SELECT count(*) FROM pairs) + (SELECT count(*) FROM unmatched)
                  AS n_rows,
                (SELECT count(*) FROM pairs) AS n_matched,
                (SELECT count(*) FROM unmatched) AS n_unmatched,
                (SELECT CAST(sum(click_id) AS BIGINT) FROM unmatched)
                  AS unmatched_click_id_sum""",
    "s08_stream_mv" ->
      """SELECT event_type, count(*) AS cnt,
              CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE)
                AS ticks_sum,
              CAST(max(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                AS ticks_max
         FROM events GROUP BY event_type ORDER BY event_type""",
    // ms arithmetic throughout (see the s04 def comment): event times are
    // floored to ms before the gap split, emitted bounds are session
    // min/max in ms, and a tail session is emitted iff its timeout
    // (end + 30 min) lies strictly before the final watermark
    // (global max event time, floored to ms, minus 1 h).
    "s04_stream_sessions" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
                  lag(epoch_us(ts) // 1000)
                    OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts) // 1000, event_id) AS prev_ms
           FROM events),
         g AS (
           SELECT user_id, ts_ms, event_id,
                  sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM e),
         sess AS (
           SELECT user_id, sid,
                  min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
                  count(*) AS n_events
           FROM g GROUP BY user_id, sid),
         ranked AS (
           SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid
           FROM sess),
         wm AS (
           SELECT max(epoch_us(ts) // 1000) - 3600000 AS final_wm FROM events)
         SELECT user_id, start_ms, end_ms, n_events
         FROM ranked, wm
         WHERE sid < last_sid OR end_ms + 1800000 < final_wm
         ORDER BY user_id, start_ms""",
    // ticks = Σ floor(value·1000) per user (order-independent integers);
    // last event by (ms-truncated ts, event_id) — the state kernel orders
    // by Timestamp.getTime, which floors micros to ms
    "s06_stream_running" ->
      """WITH agg AS (
           SELECT user_id, count(*) AS n_events,
                  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_ticks
           FROM events GROUP BY user_id),
         lastt AS (
           SELECT user_id, event_type AS last_type
           FROM (SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts) // 1000 DESC, event_id DESC) AS rn
                 FROM events)
           WHERE rn = 1)
         SELECT a.user_id, a.n_events, a.value_ticks, l.last_type
         FROM agg a JOIN lastt l USING (user_id)
         ORDER BY user_id""",
    "s03_stream_dedup" ->
      """SELECT count(*) AS n_events,
                count(DISTINCT event_id) AS n_ids,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events""",
    // digest-mode dedup collapses the doubled input to the original table
    // (event_id is unique per copy, so full-payload dedup = id dedup)
    "s09_stream_dedup_digest" ->
      """SELECT count(*) AS n_events,
                count(DISTINCT event_id) AS n_ids,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events""",
    // µs gaps-and-islands with Spark's STRICT session merge bound (diff
    // >= gap starts a new session); end = last event + gap. Identical-ts
    // ties make lag's intra-tie order irrelevant (diff 0 → same session).
    "s10_stream_session_window" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts)) AS prev_us
           FROM events),
         g AS (
           SELECT user_id, ts_us,
                  sum(CASE WHEN prev_us IS NULL
                            OR ts_us - prev_us >= 1800000000 THEN 1
                           ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM e)
         SELECT user_id, min(ts_us) AS start_us,
                max(ts_us) + 1800000000 AS end_us,
                count(*) AS n_events
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, start_us""",
    // stateless enrichment: the streamed join ≡ the batch join
    "s11_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // built-in dedup collapses the doubled input to the original table
    "s13_stream_dedup_builtin" ->
      """SELECT count(*) AS n_events,
                count(DISTINCT event_id) AS n_ids,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events""",
    // the maintained heavy-hitter sketch satisfies d43's guarantee set
    // however the stream batched — constant-row gate
    "s17_stream_heavyhitters" ->
      """SELECT true AS no_false_neg, true AS bounds_ok,
                true AS has_heavy, true AS state_bounded""",
    // the maintained sketches satisfy q101's rank-bound contract however
    // the stream batched — constant-row gate
    "s15_stream_sketch" ->
      """SELECT DISTINCT event_type,
                true AS q10_ok, true AS q50_ok, true AS q90_ok
         FROM events ORDER BY event_type""",
    // transformWithState keeps mapGroupsWithState's semantics bit-exactly,
    // so s14 shares s06's batch replica
    "s14_stream_running_tws" ->
      """WITH agg AS (
           SELECT user_id, count(*) AS n_events,
                  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_ticks
           FROM events GROUP BY user_id),
         lastt AS (
           SELECT user_id, event_type AS last_type
           FROM (SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts) // 1000 DESC, event_id DESC) AS rn
                 FROM events)
           WHERE rn = 1)
         SELECT a.user_id, a.n_events, a.value_ticks, l.last_type
         FROM agg a JOIN lastt l USING (user_id)
         ORDER BY user_id""",
    // exactly-once catch-up: the landed layout ≡ the source table
    "s12_stream_availablenow" ->
      """SELECT event_type, count(*) AS n_events,
                CAST(sum(event_id) AS BIGINT) AS id_sum,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE) / 1000 AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
