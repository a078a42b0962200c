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
    docs
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
}
