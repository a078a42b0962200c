package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training: concatenate documents and chunk the
  * token stream into fixed-size context windows ("concat-and-chunk", the
  * standard GPT-style prep). A document's pack is the chunk containing its
  * first token: pack_id = exclusive-running-token-offset div budget.
  *
  * Scale shape: a single global token stream would mean one giant window
  * partition (a non-starter at 100 TB), so the stream is sharded by a
  * deterministic key — `id mod nShards` — and each shard packs
  * independently with per-shard window aggregation: `nShards` parallel
  * streams, one shuffle, no global sort. Pack identity is the
  * (shard, pack_id) pair. On a real cluster set nShards ≈ writer
  * parallelism so each shard becomes one output file sequence. */
object Packing {

  /** Assign every document to (shard, pack_id) plus its token offset
    * within the shard stream. Deterministic: shard = id mod nShards,
    * stream order = id within shard. */
  def packTokens(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, nShards: Int = 32): DataFrame = {
    require(budget > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("token_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id",
        call_function("div", col("token_offset"), lit(budget.toLong)))
  }

  /** Per-pack summary — what a batching loader consumes: document count
    * and token total per (shard, pack). A doc counts fully toward the pack
    * holding its FIRST token, so per-pack sums fluctuate around `budget`
    * when docs straddle chunk boundaries (the chunked token stream itself
    * is exact — this is the per-doc bookkeeping view of it). */
  def packSummary(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, nShards: Int = 32): DataFrame =
    packTokens(docs, idCol, textCol, budget, nShards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Per-pack SEGMENT manifest — the attention-boundary table an LM
    * training loader consumes next to a concat-and-chunk layout
    * ([[packTokens]]): concatenation splits documents across fixed-size
    * packs, and the trainer must reset attention (and loss masking) at
    * every document boundary INSIDE a pack, so each pack needs the exact
    * list of (doc, start, length) segments tiling its token window. A
    * doc spanning packs p..q emits one segment per pack; within a pack,
    * segments tile [0, budget) with no gaps or overlaps (the final pack
    * of a shard tiles a prefix).
    *
    * Scale shape: [[packTokens]]' one hash shuffle on the shard key plus
    * a ROW-LOCAL explode over each doc's pack span (a doc emits
    * ⌈len/budget⌉+1 segments at most) — no second shuffle, no join.
    * Pure integer algebra — engine-exact. Zero-token docs emit no
    * segment (nothing to attend to). Output: (shard, pack_id, idCol,
    * start_in_pack, seg_tokens). */
  def packSegments(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Int = 2048, nShards: Int = 32): DataFrame = {
    val b = lit(budget.toLong)
    packTokens(docs, idCol, textCol, budget, nShards)
      .filter(col("n_tokens") > 0)
      .withColumn("__last_pack", call_function("div",
        col("token_offset") + col("n_tokens") - 1, b))
      .withColumn("pack_id",
        explode(sequence(col("pack_id"), col("__last_pack"))))
      .withColumn("__pack_start", col("pack_id") * b)
      .select(col("shard"), col("pack_id"), col(idCol),
        greatest(col("token_offset") - col("__pack_start"), lit(0L))
          .as("start_in_pack"),
        (least(col("token_offset") + col("n_tokens"), col("__pack_start") + b) -
          greatest(col("token_offset"), col("__pack_start")))
          .as("seg_tokens"))
  }

  /** Length-STRATIFIED packing — the padding-efficiency batching every
    * variable-length trainer wants: rank all docs by token length (the
    * GlobalOrder two-pass — no single-reducer sort), cut the order into
    * `nStrata` equal-count strata (`(rank−1)·k div n` — ntile semantics,
    * pure integers), and pack WITHIN each stratum in the deterministic
    * (md5(id), id) hash order. Batches drawn from one pack then hold
    * docs of similar length, so per-batch padding ≈ the within-stratum
    * length spread instead of the corpus-wide one (the length-bucketing
    * trick of every seq2seq/LLM data loader, as a corpus-level layout).
    *
    * Scale shape: one tokenize pass, the two-pass global rank, and the
    * per-stratum running token offsets via
    * [[GlobalOrder.withGroupedRunningTotal]] — a per-stratum window
    * would funnel the corpus into `nStrata` reducers; the grouped
    * two-pass keeps every shuffle range-partitioned. Pure integer + md5
    * algebra — engine-exact. Output: (idCol, n_tokens, global_rn,
    * stratum, token_offset, pack_id); `token_offset` restarts per
    * stratum and `pack_id` is stratum-relative. */
  def lengthStratifiedPacks(
      docs: DataFrame, idCol: String, textCol: String,
      nStrata: Int, budget: Long): DataFrame = {
    require(nStrata > 0 && budget > 0)
    val base = docs.select(col(idCol),
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .withColumn("__k", md5(col(idCol).cast("string")))
    // n rides the GlobalOrder offsets frame (__n_total) instead of a
    // separate count() action — that action was a full extra corpus scan
    // per layout call (r16 verdict). An empty corpus yields empty output.
    val ranked = GlobalOrder
      .withGlobalRowNumberAndTotal(base, Seq("n_tokens", "__k", idCol))
      .withColumn("stratum", call_function("div",
        (col("global_rn") - 1) * nStrata, col("__n_total")))
      .drop("__n_total")
    GlobalOrder.withGroupedRunningTotal(ranked, "stratum",
        Seq("__k", idCol), "n_tokens", "token_offset")
      .withColumn("pack_id",
        call_function("div", col("token_offset"), lit(budget)))
      .select(col(idCol), col("n_tokens"), col("global_rn"), col("stratum"),
        col("token_offset"), col("pack_id"))
  }

  /** Padding-waste REPORT — the measurement that justifies (or refutes)
    * [[lengthStratifiedPacks]] on a given corpus: batches of `batchSize`
    * docs are padded to their longest member, so per batch the waste is
    * `max_len·|batch| − Σ len`. The report forms batches under BOTH
    * layouts — `shuffled` (the d42 hash order, what a naive loader does)
    * and `stratified` (within-stratum hash order, [[lengthStratifiedPacks]]'
    * cut) — and aggregates exact integer totals per layout, so the
    * padding saved is a measured number, not a claim. Ragged tail
    * batches pad to their own size (never to `batchSize`).
    *
    * A THIRD layout row, `stratified_bfd`, measures the best-fit-
    * decreasing refinement ([[bfdStratifiedPacks]]): batches drawn from
    * the within-stratum LENGTH-DESC order hold consecutive lengths of
    * the sorted stratum — for fixed-count batches the sorted grouping is
    * the minimum-padding grouping, so this row is the FLOOR the
    * hash-order stratified layout is measured against (the residual
    * spread is what within-stratum randomness costs).
    *
    * Scale shape: three GlobalOrder passes (global + two grouped — no
    * funnels), batch ids by integer division on the rank, one
    * batch-keyed aggregate each, then a 3-row final rollup. Output:
    * (layout, n_batches, total_tokens, padded_tokens). */
  def paddingWasteReport(
      docs: DataFrame, idCol: String, textCol: String,
      batchSize: Int, nStrata: Int): DataFrame = {
    require(batchSize > 0 && nStrata > 0)
    val base = docs.select(col(idCol),
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .withColumn("__k", md5(col(idCol).cast("string")))
      .withColumn("__one", lit(1L))
    def rollup(batched: DataFrame, layout: String): DataFrame =
      batched
        .groupBy(col("__b"))
        .agg(count(lit(1)).as("__c"), max(col("n_tokens")).as("__m"),
          sum(col("n_tokens")).as("__s"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__s")).as("total_tokens"),
          sum(col("__m") * col("__c") - col("__s")).as("padded_tokens"))
        .select(lit(layout).as("layout"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"))
    val shuffled = rollup(
      GlobalOrder.withGlobalRowNumber(base, Seq("__k", idCol))
        .withColumn("__b", call_function("div",
          col("global_rn") - 1, lit(batchSize.toLong))),
      "shuffled")
    // same __n_total trick as lengthStratifiedPacks: no separate count()
    val strat = GlobalOrder
      .withGlobalRowNumberAndTotal(base, Seq("n_tokens", "__k", idCol))
      .withColumn("stratum", call_function("div",
        (col("global_rn") - 1) * nStrata, col("__n_total")))
      .drop("__n_total")
    val stratified = rollup(
      GlobalOrder.withGroupedRunningTotal(strat, "stratum",
          Seq("__k", idCol), "__one", "__srn")
        .withColumn("__b", concat_ws(":", col("stratum"),
          call_function("div", col("__srn"), lit(batchSize.toLong)))),
      "stratified")
    // length-desc within stratum via the NEGATED key — the grouped
    // two-pass sorts ascending, and (-len, hash, id) ascending IS
    // (len DESC, hash, id)
    val bfd = rollup(
      GlobalOrder.withGroupedRunningTotal(
          strat.withColumn("__negl", -col("n_tokens")), "stratum",
          Seq("__negl", "__k", idCol), "__one", "__srn")
        .withColumn("__b", concat_ws(":", col("stratum"),
          call_function("div", col("__srn"), lit(batchSize.toLong)))),
      "stratified_bfd")
    shuffled.unionByName(stratified).unionByName(bfd)
  }

  /** Best-fit-DECREASING refinement of [[lengthStratifiedPacks]]: the
    * same equal-count strata, but WITHIN each stratum documents order by
    * length DESC (ties by the d42 hash) before batching and token
    * packing — the classic next-fit-decreasing pass. For fixed-count
    * batches, grouping consecutive members of the sorted order is the
    * minimum-total-padding grouping (any swap across batches can only
    * raise a batch max), so this layout is the padding FLOOR at a given
    * stratum count; for token packs, consecutive similar lengths keep
    * per-pack doc counts uniform. [[paddingWasteReport]]'s third row
    * measures what it buys over the hash-order stratified layout.
    *
    * Trainers that can't accept the determinism of a fully sorted
    * stratum keep d76's hash order and pay the measured residual —
    * this operator is the other end of that dial.
    *
    * Scale shape: identical to [[lengthStratifiedPacks]] — the global
    * two-pass rank plus TWO grouped two-pass runs (position + token
    * offset) over the (-len, hash, id) order; no per-stratum reducer
    * funnel. Pure integer + md5 algebra — engine-exact. Output:
    * (idCol, n_tokens, stratum, bfd_pos, batch_id, token_offset,
    * pack_id); positions/offsets restart per stratum. */
  def bfdStratifiedPacks(
      docs: DataFrame, idCol: String, textCol: String,
      nStrata: Int, budget: Long, batchSize: Int): DataFrame = {
    require(nStrata > 0 && budget > 0 && batchSize > 0)
    val base = docs.select(col(idCol),
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .withColumn("__k", md5(col(idCol).cast("string")))
      .withColumn("__one", lit(1L))
    val strat = GlobalOrder
      .withGlobalRowNumberAndTotal(base, Seq("n_tokens", "__k", idCol))
      .withColumn("stratum", call_function("div",
        (col("global_rn") - 1) * nStrata, col("__n_total")))
      .drop("__n_total")
      .withColumn("__negl", -col("n_tokens"))
    val order = Seq("__negl", "__k", idCol)
    val positioned = GlobalOrder.withGroupedRunningTotal(
      strat, "stratum", order, "__one", "__pos0")
    GlobalOrder.withGroupedRunningTotal(
        positioned, "stratum", order, "n_tokens", "token_offset")
      .select(col(idCol), col("n_tokens"), col("stratum"),
        (col("__pos0") + 1L).as("bfd_pos"),
        call_function("div", col("__pos0"), lit(batchSize.toLong))
          .as("batch_id"),
        col("token_offset"),
        call_function("div", col("token_offset"), lit(budget))
          .as("pack_id"))
  }

  /** Per-document fixed-token-window chunking with overlap — the other
    * standard LM-training prep (long-context / RAG corpora keep document
    * boundaries and split each doc into sliding windows instead of
    * concat-and-chunk). Chunk i covers tokens [i·stride, i·stride+size)
    * with stride = size − overlap; the final chunk is the first one whose
    * window reaches the end of the doc (so every token is covered exactly
    * once per pass and no chunk starts inside the trailing overlap).
    *
    * Output: (id, chunk_id, n_chunk_tokens, chunk_text). Fully row-local:
    * tokenize → arithmetic → posexplode → array slice, no shuffle at all —
    * the 100 TB plan is a single map stage that scales with input splits.
    * Empty documents produce no chunks. */
  def chunkTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val nChunks =
      when(col("n_tokens") <= chunkSize, lit(1L))
        .otherwise(call_function("div",
          col("n_tokens") - chunkSize + (stride - 1), lit(stride.toLong)) + 1L)
    val start = col("chunk_id") * stride
    // tokenization + windowing are per-row CPU fused into the input's
    // scan stage — floor its parallelism (r21, guide §2.6; chunk_id is a
    // per-doc sequence, so placement cannot change any output value)
    Par.floor(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        size(col("__toks")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("__toks"), col("n_tokens"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize.toLong), col("n_tokens") - start)
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), (start + 1L).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Assign every document to a fixed-token-budget TRAINING SHARD in the
    * deterministic (md5(id), id) shuffled order — the d42 epoch-shuffle
    * order composed with [[packTokens]]' concat-and-chunk rule at shard
    * granularity: a doc belongs to the shard holding its FIRST token,
    * `shard_id = global_token_offset div tokensPerShard`. This is the
    * export layout an LM training job consumes: shards are contiguous
    * slices of one deterministically-shuffled token stream, so any prefix
    * of shards is itself an unbiased sample, and a loader can stream
    * shard k without knowing k−1.
    *
    * Scale shape: the global running token offset is the [[GlobalOrder]]
    * two-pass — range-partition on the order key, per-partition token
    * totals collapse to ONE row each (a broadcast frame), and each row
    * adds its within-partition running sum to its partition's offset. No
    * global-funnel window; three shuffles of which none carries more than
    * the corpus once. Pure integer + md5 algebra — engine-exact.
    *
    * Output: all input columns plus (n_tokens, pos, token_offset,
    * shard_id); `pos` is the 1-based global position in the shuffled
    * order (the manifest's order-digest input). */
  def shardByTokenBudget(
      docs: DataFrame, idCol: String, textCol: String,
      tokensPerShard: Long): DataFrame = {
    require(tokensPerShard > 0)
    val keyed = docs
      .withColumn("__k", md5(col(idCol).cast("string")))
      .withColumn("n_tokens", // null text = zero tokens (null-total rule)
        coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L)))
    val parted = keyed.repartitionByRange(col("__k"), col(idCol))
      .sortWithinPartitions("__k", idCol)
      .withColumn("__pid", spark_partition_id())
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__t"), count(lit(1)).as("__c"))
      .withColumn("__toff",
        coalesce(sum(col("__t")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__roff",
        coalesce(sum(col("__c")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__toff"), col("__roff"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__k"), col(idCol))
    parted.join(broadcast(offsets), "__pid")
      .withColumn("token_offset", col("__toff") +
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)) - col("n_tokens"))
      .withColumn("pos", col("__roff") + row_number().over(w))
      .withColumn("shard_id",
        call_function("div", col("token_offset"), lit(tokensPerShard)))
      .drop("__pid", "__toff", "__roff", "__k")
  }
}
