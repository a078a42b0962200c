package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary induction: corpus-scale BPE merge learning and
  * the distributed encode that consumes it.
  *
  * Scale shape (the GPT-2/HF trainer decomposition): the only corpus-sized
  * work is ONE word-frequency aggregation — map-side-combining `explode →
  * groupBy(word)`, so 100 TB of text reduces to at most |distinct words|
  * rows before anything leaves the executors. The merge loop then runs on
  * that bounded (word, freq) table driver-side (pair statistics only ever
  * depend on the word table, never the corpus — the textbook BPE
  * factorization), and ENCODING is distributed again: a broadcast
  * word → symbol-count join against the exploded corpus, never a per-row
  * merge scan. On an open-vocabulary web corpus the word table is pruned
  * with `minFreq` first (a frequency floor is standard practice for BPE
  * training); the collect is |surviving words|-sized, not corpus-sized.
  */
object Vocab {

  /** One learned merge: (rank, left, right, left+right, weighted count). */
  private[graft] type Merge = (Int, String, String, String, Long)

  /** Code-point segmentation — the BPE base alphabet. `w.map(_.toString)`
    * would split on UTF-16 code units, turning a supplementary-plane
    * character (emoji, CJK ext-B) into two surrogate half-symbols while
    * the oracle (and Spark's own `length`) counts code points; iterating
    * code points keeps merges, symbol counts, and the d81/d82 hashes
    * aligned on non-BMP corpora. */
  private[graft] def codePointSyms(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Apply one merge greedily left-to-right, non-overlapping (the BPE
    * rewrite rule: "a a a" under merge (a,a) → [aa, a], never [a, aa]). */
  private[graft] def applyMerge(
      s: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += s(i); i += 1 }
    }
    b.result()
  }

  /** Learn up to `nMerges` merges from a (word, freq) table. Each round
    * counts adjacent symbol pairs weighted by word frequency (overlapping
    * occurrences each count — "aaa" contributes (a,a) twice), picks the
    * max by (count desc, left asc, right asc) — a total order, so the
    * learned table is deterministic for any input order — and rewrites
    * every segmentation. Stops early when no pairs remain. Returns the
    * merge table and the final per-word segmentations. */
  private[graft] def bpeLearn(
      wf: Seq[(String, Long)],
      nMerges: Int): (Seq[Merge], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] =
      wf.iterator.map { case (w, _) => w -> codePointSyms(w) }.toMap
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, f) <- wf) {
        val s = segs(w)
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) =
          counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, l + r, cnt))
        segs = segs.map { case (w, s) => w -> applyMerge(s, l, r) }
        rank += 1
      }
    }
    (merges.result(), segs)
  }

  /** The corpus word-frequency table — the single corpus-sized pass
    * behind both [[bpeMerges]] and [[bpeEncodeStats]]. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The word-frequency collect behind the driver-side merge loop, LOUDLY
    * capped (the logisticTrainCollected posture): an open-vocabulary crawl
    * whose surviving word table exceeds `maxWords` raises with guidance
    * instead of silently OOM-ing the driver. The collect itself is bounded
    * by `limit(maxWords + 1)` so even the failing path never materializes
    * more than the cap. */
  private def collectedWordFreq(
      docs: DataFrame, textCol: String, minFreq: Long,
      maxWords: Int): Seq[(String, Long)] = {
    require(maxWords >= 1, s"maxWords must be positive, got $maxWords")
    val rows = wordFreq(docs, textCol).filter(col("freq") >= minFreq)
      .limit(maxWords + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (rows.size > maxWords)
      throw new IllegalStateException(
        s"BPE word table exceeds maxWords=$maxWords after the minFreq=" +
          s"$minFreq floor — raise minFreq (the standard BPE frequency " +
          "floor) or maxWords; collecting an unbounded open-vocabulary " +
          "word table would OOM the driver at corpus scale")
    rows
  }

  /** The learned merge table: (rank, left_sym, right_sym, merged, cnt),
    * one row per merge in learned order. */
  def bpeMerges(
      spark: SparkSession, docs: DataFrame, textCol: String,
      nMerges: Int, minFreq: Long = 1L,
      maxWords: Int = 1000000): DataFrame = {
    import spark.implicits._
    val (merges, _) =
      bpeLearn(collectedWordFreq(docs, textCol, minFreq, maxWords), nMerges)
    merges.toDF("rank", "left_sym", "right_sym", "merged", "cnt")
  }

  /** Distributed encode under a vocabulary learned from the SAME corpus:
    * per document (n_words, n_chars, n_bpe_tokens, chars_per_tok_fp) where
    * n_bpe_tokens is the symbol count after all merges and the compression
    * ratio is the exact fixed-point (n_chars·10⁶) div n_bpe_tokens. The
    * encode never re-applies merges per row — each distinct word's final
    * symbol count is resolved once driver-side, then a broadcast join
    * against the exploded corpus aggregates per doc (a word outside the
    * trained table — possible under minFreq > 1 — falls back to its
    * character count, the BPE base-alphabet segmentation). */
  def bpeEncodeStats(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int, minFreq: Long = 1L,
      maxWords: Int = 1000000): DataFrame = {
    import spark.implicits._
    val (_, segs) =
      bpeLearn(collectedWordFreq(docs, textCol, minFreq, maxWords), nMerges)
    val ws = segs.iterator.map { case (w, s) => (w, s.length.toLong) }
      .toSeq.sortBy(_._1).toDF("word", "n_syms")
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val agg = dt.join(broadcast(ws), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(coalesce(col("n_syms"), length(col("word"))))
          .as("n_bpe_tokens"))
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        when(coalesce(col("n_bpe_tokens"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(n_chars * 1000000) div n_bpe_tokens"))
          .as("chars_per_tok_fp"))
  }
}
