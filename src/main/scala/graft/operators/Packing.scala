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
}
