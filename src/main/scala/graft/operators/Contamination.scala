package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data step that removes corpus
  * documents overlapping an evaluation set (so the model isn't trained on
  * its own test data).
  *
  * Scale shape: the benchmark side is an eval set — thousands of docs, not
  * billions — so its distinct shingle-hash set is broadcast; the corpus is
  * scanned once, each doc's (already distinct) shingle hashes are exploded
  * and probed against the broadcast set, and one hash-shuffle on doc_id
  * re-aggregates the per-doc containment ratio. No corpus self-join, no
  * O(n²) anywhere; cost is O(corpus shingles).
  *
  * Matching is on 64-bit shingle hashes, equal to string-shingle
  * containment up to ~n²/2⁶⁴ collision probability (the same accepted
  * parity as [[Dedup]]'s MinHash verification, asserted in OperatorsSpec).
  */
object Contamination {

  /** Per-corpus-doc contamination: the fraction of its distinct `shingleN`
    * word-gram shingles that appear anywhere in the benchmark. Docs with
    * fewer than `shingleN` tokens have no shingles and score 0 (they can't
    * carry a benchmark passage). Output: (doc_id, n_shingles, n_matched,
    * contamination ∈ [0,1]). */
  def contaminationScores(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingleHashes(col(textCol), shingleN)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1))
    corpus
      .select(col(idCol).as("doc_id"),
        explode_outer(Dedup.shingleHashes(col(textCol), shingleN)).as("sh"))
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("sh")).as("n_shingles"),
        count(col("__hit")).as("n_matched"),
        coalesce(count(col("__hit")).cast("double") /
          when(count(col("sh")) > 0, count(col("sh"))), lit(0.0))
          .as("contamination"))
  }

  /** Pipeline ending: corpus minus documents whose contamination is at or
    * above `threshold` — one broadcast-probed scan plus an id anti-join. */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    val dirty = contaminationScores(corpus, benchmark, idCol, textCol, shingleN)
      .filter(col("contamination") >= threshold)
      .select(col("doc_id").as(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
