package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting.
  *
  * Everything here composes built-in codegen'd `functions._` (split /
  * transform / aggregate / filter), so the whole stage stays inside
  * WholeStageCodegen and columns prune down to just `text` at the parquet
  * scan — the properties that matter when the documents table is 100 TB.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Lowercased alphanumeric words (punctuation-stripped). */
  def words(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: alphanumeric chunks plus each
    * punctuation character as its own token — the classic GPT-2
    * pre-tokenizer shape as a pure match-count (the earlier lookaround
    * split had identical semantics but lookarounds don't exist in RE2, so
    * no oracle could replicate it; a plain alternation works in both
    * engines and avoids materializing the chunks). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Characters matching a regex, counted by erase-and-diff (identical
    * semantics in any engine with regexp_replace + length). */
  def charClassCount(text: Column, classRegex: String): Column =
    length(text) - length(regexp_replace(text, classRegex, ""))

  /** PII scrubbing patterns — RE2-compatible (no lookarounds/backrefs) so
    * any engine replicates them. Conservative by design: an email is a
    * token with exactly one `@` between word-ish runs; a phone is `+` or a
    * digit followed by ≥6 digit/sep characters ending in a digit. */
  val emailRe: String = "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe: String = "\\+?[0-9][0-9 ().-]{5,}[0-9]"

  /** Replace every match of `pattern` with `token` (one codegen'd regex
    * pass; Spark regexp_replace is global). */
  def redact(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** Number of matches of `pattern` (codegen'd regexp_count). */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  private val stopwordsEn = Seq(
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "are", "or", "from")

  /** Floor-quantize to 4 decimals. Used instead of `round` throughout the
    * quality features: Spark rounds HALF_UP, most other engines round
    * half-even, so `round` can differ on boundary values across engines —
    * floor quantization is bit-identical everywhere. */
  private def q4(c: Column): Column = floor(c * 10000) / 10000

  /** Heuristic quality features in one projection:
    * n_tokens, mean token length, punctuation ratio, digit ratio,
    * stopword ratio — each floor-quantized to 4 decimals. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks)
    val nD = n.cast("double")
    val len = length(text).cast("double")
    Seq(
      "n_tokens" -> n,
      "mean_token_len" -> when(n > 0,
        q4(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / nD)).otherwise(lit(0.0)),
      "punct_ratio" -> when(len > 0,
        q4(charClassCount(text, "[\\p{P}]").cast("double") / len))
        .otherwise(lit(0.0)),
      "digit_ratio" -> when(len > 0,
        q4(charClassCount(text, "[0-9]").cast("double") / len))
        .otherwise(lit(0.0)),
      "stopword_ratio" -> when(n > 0,
        q4(size(filter(toks, t => t.isin(stopwordsEn: _*))).cast("double") / nD))
        .otherwise(lit(0.0))
    )
  }

  /** Single quality score in [0,1]: length in a sane band, low punctuation
    * and digit density, some stopwords (English-ish prose signal). Built
    * from the quantized features so it's exactly replicable cross-engine
    * (oracle row d11). */
  def qualityScore(text: Column): Column = {
    val feats = qualityFeatures(text).toMap
    val lengthOk = when(feats("n_tokens").between(10, 100000), lit(1.0))
      .otherwise(lit(0.0))
    val punctOk = lit(1.0) - least(feats("punct_ratio") * 4, lit(1.0))
    val digitOk = lit(1.0) - least(feats("digit_ratio") * 4, lit(1.0))
    val stopOk = least(feats("stopword_ratio") * 4, lit(1.0))
    q4((lengthOk + punctOk + digitOk + stopOk) / 4)
  }

  private val stopwordSets: Map[String, Seq[String]] = Map(
    "en" -> stopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "den", "mit", "von", "auf", "im", "für", "des", "dem", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "de",
      "des", "du", "dans", "pour", "que", "qui", "sur", "avec", "au"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una",
      "de", "en", "que", "por", "para", "con", "del", "se", "su")
  )

  /** N-gram/stopword-overlap language ID over a fixed language set.
    * Returns the language whose stopword list overlaps the document's
    * token set the most; "und" (undetermined) when nothing matches.
    * Pure built-ins → distributed, codegen'd, no model file needed. */
  def langId(text: Column): Column = {
    val toks = words(text)
    val scored = stopwordSets.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(
        size(filter(toks, t => t.isin(sw: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Word n-grams with every occurrence kept (the frequency-counting
    * sibling of [[Dedup.shingles]], which deduplicates for set-Jaccard);
    * empty array when the doc has fewer than n tokens. Evaluated by the
    * single-pass [[graft.functions.WordNGrams]] kernel — the compositional
    * `transform(sequence, element_at…)` form (kept below as
    * [[ngramsReference]]) re-evaluates the tokenizer per element and falls
    * out of codegen: 25× slower corpus-wide at sf0.1. Requires
    * [[graft.functions.GraftFunctions.register]]. */
  def ngrams(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordNgramsOf(text, n)

  /** Built-ins-only reference form of [[ngrams]] — semantically identical
    * (asserted in FunctionsSpec), mirrors the DuckDB oracle construction;
    * use only on bounded inputs. */
  def ngramsReference(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    ).otherwise(array().cast("array<string>"))
  }

  /** Per-doc token repetition signals (the Gopher-style "repetitious text"
    * quality filter): distinct-token fraction and most-frequent-token
    * share. Shaped as explode → (doc, token) count → per-doc aggregate —
    * linear work with map-side partial aggregation on both shuffles, not a
    * per-row O(tokens²) higher-order-function scan, so a 100k-token
    * document costs 100k rows, never 10¹⁰ comparisons. Docs with zero
    * tokens have no rows here (no tokens to repeat). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        q4(lit(1.0) - col("n_distinct").cast("double") /
          col("n_tokens")).as("repetition_q"),
        q4(col("top_cnt").cast("double") / col("n_tokens")).as("top_frac_q"))

  /** Corpus-level top-k n-gram frequencies with a total order (count desc,
    * n-gram asc) so the cut is deterministic. The classic distributed
    * wordcount shape: explode → hash aggregate (partial map-side combine →
    * final) → TakeOrderedAndProject, which keeps only k rows per partition
    * before the single-point merge — no global sort of the frequency
    * table. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram").asc)
      .limit(k)

  /** OpenRefine-style fingerprint key: sorted distinct words joined by a
    * space. Documents equal up to word order / duplication / punctuation
    * share a key — groupBy(fingerprint) clusters them in one shuffle. */
  def fingerprintKey(text: Column): Column =
    concat_ws(" ", array_sort(array_distinct(words(text))))

  /** 64-bit rolling document fingerprint (xxhash64 of the fingerprint key). */
  def fingerprint64(text: Column): Column = xxhash64(fingerprintKey(text))

  /** Corpus-level rarity signals per document: distinct-token count, hapax
    * count (tokens whose corpus-wide document frequency is 1 — unique to
    * this doc), and the hapax ratio (a misspelling/garbage signal: clean
    * prose shares its vocabulary, mojibake doesn't).
    *
    * Scale shape: the document-frequency table is vocabulary-sized — far
    * too big to broadcast — so this is the canonical big-big shuffle join
    * on the token key, with both sides reduced first (per-doc distinct
    * explode; DF pre-aggregated with map-side combine). The exploded
    * token frame feeds both the DF aggregate and the join's probe side
    * with identical partitioning on `tok`, so the exchange is reusable. */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTokens = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val df = docTokens.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    docTokens.join(df, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct"),
        count(when(col("df") === 1, 1)).as("n_hapax"))
      .select(col("doc_id"), col("n_distinct"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_distinct")).as("hapax_ratio"))
  }

  /** Per-document top-k salient terms under TF-IDF-style weighting. The
    * weight is the exact rational surrogate `tf · N / df` (term frequency
    * scaled by inverse relative document frequency) rather than
    * `tf · ln(N/df)`: IEEE multiply/divide are correctly rounded so the
    * score is bit-identical in any engine, while `ln` is libm-dependent
    * and can flip a quantization boundary — and the induced per-document
    * ranking only reorders where ln would tie anyway at equal df. Swap in
    * log-idf downstream if calibrated magnitudes matter.
    *
    * Scale shape: ONE corpus tokenization pass — explode feeds a
    * (doc, term) count, and document frequency is a `count() OVER
    * (PARTITION BY term)` window over that same frame rather than a
    * separate aggregate joined back (the agg+join form re-scans and
    * re-tokenizes the corpus for the probe side; the window shuffles the
    * compact tf frame on the identical term key, so it trades nothing).
    * The per-doc top-k is `row_number() <= k` which compiles to
    * WindowGroupLimit — each shuffle partition trims to k before the
    * exchange, so the window never materializes the full scored frame. */
  def salientTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
    scored
      .withColumn("term_rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term_rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }

  /** Per-stratum IQR outlier filter on a numeric column (the classic
    * length-outlier document removal): keep rows within
    * [q1 − k·IQR, q3 + k·IQR] of their stratum's exact quartiles. Two-pass
    * shape: the per-stratum stats frame is tiny (one row per stratum) and
    * broadcast back onto the corpus — the corpus itself is scanned twice
    * but never shuffled on a data-dependent key. The bound arithmetic is
    * written exactly as `q1 − (q3−q1)·k` / `q3 + (q3−q1)·k` so an oracle
    * replica computes bit-identical doubles. */
  def iqrFilter(
      df: DataFrame, stratumCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    val stats = df.groupBy(col(stratumCol)).agg(
      expr(s"percentile($valueCol, 0.25)").as("__q1"),
      expr(s"percentile($valueCol, 0.75)").as("__q3"))
    df.join(broadcast(stats), stratumCol)
      .filter(
        col(valueCol) >= col("__q1") - (col("__q3") - col("__q1")) * k &&
        col(valueCol) <= col("__q3") + (col("__q3") - col("__q1")) * k)
      .drop("__q1", "__q3")
  }

  /** Robust (median/MAD) outlier screen on a numeric column: flag rows
    * whose absolute deviation from their stratum's median exceeds
    * k × 1.4826 × MAD (1.4826 scales MAD to σ under normality — the
    * standard robust z-score). Complements [[iqrFilter]]: quartile fences
    * break down when outliers drag the quartiles themselves, while the
    * MAD scale estimator has a 50% breakdown point — the screen for
    * numeric quality signals (score drift, latency spikes, metric
    * corruption) where the contamination being hunted can be heavy.
    *
    * Two-pass by necessity (the median must exist before deviations can
    * be measured; the deviations' median needs a second pass). Both stat
    * frames are one row per stratum and broadcast back — the corpus is
    * scanned, never shuffled on a data-dependent key. Threshold
    * arithmetic is written exactly as `mad × 1.4826 × k` so an oracle
    * replica computes bit-identical doubles. */
  def madOutliers(
      df: DataFrame, stratumCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(stratumCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val dev = df.join(broadcast(med), stratumCol)
      .withColumn("__ad", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(col(stratumCol))
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(broadcast(mad), stratumCol)
      .withColumn("is_outlier", col("__ad") > col("__mad") * 1.4826 * k)
      .drop("__med", "__ad", "__mad")
  }

  /** Corpus-frequency fluency prior: for each document, the MEAN corpus
    * occurrence count of its word bigrams — the count-based language-model
    * signal (the unsmoothed heart of KenLM-style count LMs) that separates
    * template/boilerplate text (bigrams the corpus repeats constantly) from
    * distinctive or noisy text (bigrams seen nowhere else). Complements
    * [[duplicateSpans]] (which asks "is this EXACT span repeated?") with a
    * soft frequency prior, and generalizes d22's rare-token fraction from
    * unigrams to bigrams. Output: (doc_id, n_bigrams, freq_sum, mean_freq);
    * docs with fewer than two tokens report zeros.
    *
    * Scale shape: identical digest-first contract as [[duplicateSpans]] —
    * one single-pass [[graft.functions.WordNGrams]] kernel scan per side,
    * all shuffles keyed on xxhash64(gram) (8-byte keys, never gram
    * strings); the frequency table aggregates with map-side combine before
    * its one shuffle. The mean is one IEEE double division of two exact
    * longs, so the DuckDB oracle hash-matches. Requires
    * [[graft.functions.GraftFunctions.register]]. */
  def bigramFluency(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        explode_outer(graft.functions.GraftFunctions
          .wordNgramsOf(col(textCol), 2)).as("gram"))
      // same null contract as duplicateSpans: keep short docs' null row
      .select(col("doc_id"),
        when(col("gram").isNotNull, xxhash64(col("gram"))).as("gh"))
    val freq = grams(docs)
      .filter(col("gh").isNotNull)
      .groupBy(col("gh"))
      .agg(count(lit(1)).as("__freq"))
    grams(docs)
      .join(freq, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("gh")).as("n_bigrams"),
        coalesce(sum(col("__freq")), lit(0L)).as("freq_sum"),
        coalesce(sum(col("__freq")).cast("double") /
          when(count(col("gh")) > 0, count(col("gh"))), lit(0.0))
          .as("mean_freq"))
  }

  /** Duplicate-span detection (the corpus-level signal behind exact
    * substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better"): for each document, the fraction of its word
    * n-gram positions whose n-gram also appears in at least `minDocs`
    * distinct documents corpus-wide. Output per doc: (doc_id, n_grams,
    * n_dup, dup_frac) — a doc with a high dup_frac is mostly boilerplate
    * copied across the corpus even when no whole-document near-dup fires.
    *
    * Scale shape: the corpus is scanned twice (the single-pass
    * [[graft.functions.WordNGrams]] kernel re-tokenizes cheaper than
    * materializing the gram table, which is ~n× corpus size — and the
    * compositional transform/slice form re-inlines the tokenizer per
    * element, measured ~10× slower; requires
    * [[graft.functions.GraftFunctions.register]]); the gram-frequency
    * aggregate and the join back both key on
    * xxhash64(gram) — 8-byte shuffle keys, never the gram strings
    * (same digest-first contract as [[Dedup.exactDedup]], same ~n²/2⁶⁴
    * collision parity as the MinHash path). The frequent-gram side shrinks
    * to grams above `minDocs` before the join; at 100 TB a runtime bloom
    * filter on the fact side prunes further (config, not code). */
  def duplicateSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        explode_outer(graft.functions.GraftFunctions
          .wordNgramsOf(col(textCol), n)).as("gram"))
      // xxhash64(NULL) is the SEED (42), not NULL — a short doc's
      // explode_outer null row must stay null so the counts skip it
      .select(col("doc_id"),
        when(col("gram").isNotNull, xxhash64(col("gram"))).as("gh"))
    val common = grams(docs)
      .filter(col("gh").isNotNull)
      .groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gh"), lit(1).as("__dup"))
    grams(docs)
      .join(common, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("gh")).as("n_grams"),
        count(col("__dup")).as("n_dup"),
        coalesce(count(col("__dup")).cast("double") /
          when(count(col("gh")) > 0, count(col("gh"))), lit(0.0))
          .as("dup_frac"))
  }

  /** Exact-substring span REMOVAL (the transform of Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better", §4 —
    * their suffix-array ExactSubstr dedup, re-expressed distributed):
    * where [[duplicateSpans]] only MEASURES the duplicated-gram fraction,
    * this emits, per document, the maximal duplicated token spans and the
    * text with those spans removed.
    *
    * Distributed approximation of the suffix-array method: a token span
    * is duplicated iff every word `n`-gram inside it appears in ≥
    * `minDocs` distinct documents. Per doc, the shared gram POSITIONS
    * form intervals [pos, pos+n−1]; merging overlapping-or-adjacent
    * intervals (classic gaps-and-islands with a running max) yields the
    * maximal duplicated spans — any shared token run of length ≥ n is
    * found exactly (its every window is shared corpus-wide), runs shorter
    * than n are below the detection floor by construction (Lee et al. use
    * the same minimum-length threshold, 50 BPE tokens). Within-doc
    * repetition is deliberately out of scope (that is d54/d15's domain);
    * `minDocs` counts DISTINCT docs, matching [[duplicateSpans]].
    *
    * Output per input doc: `n_tokens`, `n_spans`, `dup_tokens` (tokens
    * covered by some span), and `cleaned_text` — the NORMALIZED token
    * stream (lowercased, whitespace-collapsed: the same stream the grams
    * are computed over) minus covered tokens, space-joined. Docs with no
    * duplicated span keep their full normalized stream.
    *
    * Scale shape: gram frequency and the join back key on xxhash64
    * digests, never gram strings (the [[duplicateSpans]] contract — 8-byte
    * shuffle keys); the interval merge is two windows + one aggregate
    * over ONLY the shared positions (at healthy corpora a small fraction
    * of all gram positions); the mask is a per-row HOF over the doc's own
    * token array against its own span list (row-local, no shuffle). All
    * span arithmetic is integer-exact — engine-portable bit-for-bit. */
  def removeDuplicateSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2)
    val gp = docs
      .select(col(idCol).as("doc_id"),
        posexplode_outer(graft.functions.GraftFunctions
          .wordNgramsOf(col(textCol), n)))
      .select(col("doc_id"), col("pos"),
        when(col("col").isNotNull, xxhash64(col("col"))).as("gh"))
    val common = gp
      .filter(col("gh").isNotNull)
      .groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gh"))
    val shared = gp
      .filter(col("gh").isNotNull)
      .join(common, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"), (col("pos") + (n - 1)).as("end"))
    // gaps-and-islands: a position starts a new span iff its interval
    // neither overlaps nor touches the running max end of its predecessors
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = shared
      .withColumn("__pme", max(col("end")).over(
        byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", (col("__pme").isNull ||
        col("pos") > col("__pme") + 1).cast("int"))
      .withColumn("__isl", sum(col("__new")).over(
        byPos.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = islands
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("s_start"), max(col("end")).as("s_end"))
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("s_end") - col("s_start") + 1).as("dup_tokens"),
        sort_array(collect_list(struct(col("s_start"), col("s_end"))))
          .as("__spans"))
    // __toks MUST be the same token stream the gram positions index into:
    // wordNgramsOf(text, 1) is the WordNGrams kernel itself at n=1
    // (Character.isWhitespace tokenization, lowercased). A regex
    // split(lower, "\\s+") is ASCII-whitespace only — on U+2028/U+2029 or
    // U+001C-001F input its indices would misalign with the kernel's and
    // the mask would remove the WRONG tokens (pinned in FunctionsSpec).
    val toks = docs.select(col(idCol).as("doc_id"),
      graft.functions.GraftFunctions.wordNgramsOf(col(textCol), 1)
        .as("__toks"))
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(size(col("__toks")), lit(0)).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        array_join(filter(col("__toks"), (_, i) =>
          !exists(coalesce(col("__spans"),
            array().cast("array<struct<s_start:int,s_end:int>>")),
            sp => i >= sp.getField("s_start") && i <= sp.getField("s_end"))),
          " ").as("cleaned_text"))
  }

  /** C4-style LINE-level dedup (Raffel et al. 2020 §2.2 "we discarded all
    * but one of any three-sentence span occurring more than once";
    * RefinedWeb's line-dedup stage): sub-document deduplication at a
    * fixed granularity — the corpus keeps exactly ONE occurrence of each
    * distinct line, the globally-first one, and every other document
    * loses it. Complements [[removeDuplicateSpans]] (arbitrary-position
    * spans) with the cheaper aligned-unit semantics real pipelines run
    * first.
    *
    * Lines here are fixed `lineTokens`-token chunks of the normalized
    * token stream ([[Packing.chunkTokens]] with zero overlap) — the
    * deterministic unit this corpus supports (no newlines). "First"
    * means smallest (doc_id, chunk_id) under lexicographic struct
    * ordering — one map-side-combinable MIN over a 16-byte struct,
    * integer-exact in any engine and correct for ANY chunk count or id
    * range (a packed doc_id·10⁶+chunk_id integer would silently alias
    * across documents once a doc exceeds 10⁶ chunks).
    *
    * Output per input doc: n_lines, n_kept, cleaned_text (surviving
    * lines in document order; empty when everything deduped away).
    *
    * Scale shape: one chunking pass (explode+slice over the per-doc token
    * array), one MIN aggregate keyed on the line digest (8-byte shuffle
    * keys — xxhash64(line), never line strings, the d35 contract), one
    * digest-keyed join back, one per-doc reassembly agg. Everything
    * corpus-sized that shuffles carries digests. */
  def dedupLines(
      docs: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 10): DataFrame = {
    require(lineTokens > 0)
    val lines = Packing.chunkTokens(docs, idCol, textCol, lineTokens, 0)
      .select(col(idCol).as("doc_id"), col("chunk_id"),
        col("chunk_text"), xxhash64(col("chunk_text")).as("lh"),
        struct(col(idCol).as("doc_id"), col("chunk_id")).as("okey"))
    val winners = lines.groupBy(col("lh"))
      .agg(min(col("okey")).as("wkey"))
    val kept = lines.join(winners, Seq("lh"))
      .filter(col("okey") === col("wkey"))
    val cnt = lines.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"))
    val agg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(sort_array(collect_list(
          struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("cleaned_text"))
    docs.select(col(idCol).as("doc_id"))
      .join(cnt, Seq("doc_id"), "left")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** C4-style line + document rule filtering (Raffel et al. 2020 §2.2 —
    * the heuristic cleaning applied to Common Crawl before any learned
    * signal; RefinedWeb and Dolma run near-identical rule sets). Lines
    * (newline-delimited) are kept iff they end in terminal punctuation,
    * carry at least `minLineWords` words, and do not contain
    * "javascript"; the whole document is dropped iff it contains "lorem
    * ipsum", a curly brace, any word from `badwords` (word-boundary
    * match via the tokenizer, not substring — "class" never trips
    * "ass"), or fewer than `minKeptLines` surviving lines. One output
    * row per input doc with the audit columns visible (the
    * [[gopherRules]] contract): n_lines, n_kept, doc_kept, and the
    * reassembled `cleaned_text` (kept lines re-joined by newline; empty
    * when the doc is dropped).
    *
    * Scale shape: entirely ROW-LOCAL — the line split, per-line word
    * counts, and doc-level scans are array ops inside one narrow
    * projection; no Exchange, no Join, nothing leaves the row. At
    * 100 TB this stage is scan-bound, which is the point: C4 runs it
    * before anything that shuffles. Pure string/integer algebra, so an
    * engine replica hash-matches exactly. */
  def c4LineRules(
      docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 2,
      // production callers pass the full blocklist (C4 uses the LDNOOBW
      // word list); the default is empty, not a toy list
      badwords: Seq[String] = Seq.empty): DataFrame = {
    require(minLineWords > 0 && minKeptLines >= 0)
    // a null page must still produce a full audit row (dropped, not
    // null-flagged): treat it as the empty page — 1 empty line, 0 kept
    val page = coalesce(col(textCol), lit(""))
    val lines = split(page, "\n")
    val keptLines = filter(lines, l =>
      l.rlike("[.!?]$") &&
        size(words(l)) >= minLineWords &&
        !lower(l).contains("javascript"))
    val badHit =
      if (badwords.isEmpty) lit(false)
      else arrays_overlap(words(col("__page")),
        array(badwords.map(b => lit(b.toLowerCase)): _*))
    docs
      .select(col(idCol), page.as("__page"), lines.as("__lines"),
        keptLines.as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        (!(lower(col("__page")).contains("lorem ipsum") ||
          col("__page").contains("{") || badHit ||
          size(col("__kept")) < minKeptLines)).as("doc_kept"),
        col("__kept").as("__kept"))
      .withColumn("cleaned_text",
        when(col("doc_kept"), array_join(col("__kept"), "\n"))
          .otherwise(lit("")))
      .drop("__kept")
  }

  /** BM25 keyword retrieval: rank documents for a FIXED query-term list
    * (Robertson & Spärck Jones; the Okapi BM25 scoring used by Lucene /
    * Elasticsearch and sparse-retrieval data pipelines).
    *
    * Engine-parity design (same contract as [[salientTerms]]): the IDF is
    * the exact rational surrogate `(N − df + 0.5) / (df + 0.5)` — no `ln`,
    * whose last ulp is libm-dependent — and the per-term contributions are
    * summed in FIXED query order as an explicit left-to-right `+` chain
    * (one pivoted column per term), not a SUM aggregate whose accumulation
    * order is partition-dependent. Every remaining op is IEEE ×/÷/+ with
    * an identical expression tree on the oracle side, so the double score
    * is bit-identical in any engine. The surrogate is monotone in df, so
    * rankings only reorder where log-idf would tie anyway.
    *
    * Scale shape: the scoring side is ONE corpus tokenization pass — the
    * `isin` filter prunes the exploded frame to the query terms before any
    * shuffle, and document frequency is a `count() OVER (PARTITION BY
    * term)` window over the same compact tf frame ([[salientTerms]]'s
    * trick: an agg-plus-join-back would duplicate the tf subtree in the
    * DAG and re-tokenize the corpus; the window shuffles only the
    * |matching docs| × |terms| tf rows — with few query terms that lands
    * on few reducers, fine because the frame is corpus-independent-ly
    * small). The N/avgdl corpus statistic is a separate text-only scan
    * reduced to a 1-row broadcast — in production it is precomputed once
    * per corpus snapshot and reused by every query. The final top-k is
    * orderBy+limit = TakeOrderedAndProject (per-partition heaps, no global
    * sort). Only docs containing ≥1 query term are ranked — at 100 TB the
    * score-0 tail is the corpus. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "fixed small query only")
    val base = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        col("toks"))
    // corpus stats: one tiny broadcast row (exact longs; avgdl is ONE
    // IEEE division so the oracle reproduces it bit-exactly)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("len"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("len"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // tf holds ONE row per (doc, term), so df = window count over it —
    // no second tokenization scan (see scaladoc)
    val withDf = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))).cast("double"))
    val contrib = withDf
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        // exact-rational idf × the BM25 tf saturation; expression tree
        // mirrored verbatim in the DuckDB oracle
        (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") / (col("tf") +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * (col("len").cast("double") / col("avgdl"))))))
          .as("c"))
    // fixed-order summation: one column per query term, added left to
    // right — sum(when(...)) collapses exactly one value per (doc, term)
    val termCols = terms.map(t =>
      sum(when(col("term") === t, col("c"))).as(s"c_$t"))
    val pivoted = contrib.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
    val score = terms.map(t => coalesce(col(s"c_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    pivoted
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** [[bm25TopK]] for a QUERY BATCH over arbitrary item keys — the
    * keyword half of the batch hybrid-retrieval stack (e28): every query
    * doc's DISTINCT tokens are its term set, and each (query, item) pair
    * scores Σ_terms idf·saturation over the items (chunks, docs — any
    * `keyCols`) containing that term.
    *
    * Engine-parity design: the per-(term, item) contribution is the same
    * exact-rational idf surrogate × tf-saturation expression tree as
    * [[bm25TopK]] (bit-identical doubles in any engine), but the
    * PER-QUERY summation cannot use d37's fixed-order pivot (term sets
    * vary per query), so each contribution FLOOR-QUANTIZES to a ×10⁹
    * fixed-point BIGINT first and the per-(query, item) score is an
    * exact INTEGER sum — order-independent, hash-exact. Ties break by
    * the item keys.
    *
    * Scale shape: ONE corpus tokenization pass into the (item, term) tf
    * frame (the wordcount shape); the batch's distinct term set
    * broadcast-prunes it BEFORE the df window (so the term-keyed window
    * shuffles only matching tf rows, the d37 trick at batch width); the
    * query join is a broadcast of the (query, term) pairs; the final
    * top-k is a query-partitioned WindowGroupLimit. Corpus statistics
    * (N, avgdl) are one text-only scan reduced to a broadcast row —
    * precomputed per corpus snapshot in production. Only items sharing
    * ≥1 term with a query are ranked — the score-0 tail never
    * materializes. */
  def bm25TopKBatch(
      corpus: DataFrame, queries: DataFrame, keyCols: Seq[String],
      textCol: String, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (ranked, tfq) = bm25TopKBatchPlan(corpus, queries, keyCols, textCol,
      queryIdCol, queryTextCol, k, k1, b)
    // the posting frame is corpus-×-term-set-sized; the RESULT is
    // |queries|·k. Force the tiny result and free the posting block HERE
    // (the minhashNearDups pattern) — checkpointed mid-plan it would be
    // unreachable to any caller-side release and leak until RDD GC
    // (r16 advice)
    try ranked.localCheckpoint(true)
    finally Dedup.release(tfq)
  }

  /** [[bm25TopKBatch]]'s lazy plan plus its checkpointed posting frame —
    * split out so the plan shape (df as aggregate+broadcast, per-query
    * WindowGroupLimit) stays pinnable in PlansSpec; the public entry
    * forces the result and releases the posting block. */
  private[graft] def bm25TopKBatchPlan(
      corpus: DataFrame, queries: DataFrame, keyCols: Seq[String],
      textCol: String, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): (DataFrame, DataFrame) = {
    require(keyCols.nonEmpty && k >= 1)
    val base = corpus.select(keyCols.map(col) :+
      tokens(col(textCol)).as("toks"): _*)
      .select(keyCols.map(col) :+ size(col("toks")).cast("long").as("len") :+
        col("toks"): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(keyCols.map(col) :+ col("len") :+
        explode(col("toks")).as("term"): _*)
      .groupBy(keyCols.map(col) :+ col("len") :+ col("term"): _*)
      .agg(count(lit(1)).cast("double").as("tf"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(tokens(col(queryTextCol)))).as("term"))
    // prune the tf frame to the batch's term set BEFORE computing df —
    // df is per-term over the corpus, so the filtered frame computes it
    // identically while touching only matching rows. The posting frame is
    // checkpointed ONCE (it feeds both the df aggregate and the scoring
    // join; the public entry forces the result and releases this block
    // before returning), and df is a TINY
    // (≤ batch-term-set) aggregate broadcast back — NOT a per-term window:
    // on a small-vocabulary corpus a term-partitioned window funnels the
    // whole posting frame into |terms| reducers (measured 3.9× at 10× on
    // the 31-term corpus; the agg+broadcast form reads ~linear)
    val tfq = tf.join(broadcast(qterms.select(col("term")).distinct()),
        Seq("term"))
      .localCheckpoint(true)
    val dfs = tfq.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val withDf = tfq.join(broadcast(dfs), Seq("term"))
    (bm25BatchRank(withDf, stats, qterms, keyCols, k, k1, b), tfq)
  }

  /** The shared per-(term, item) → per-(query, item) BM25 ranking tail —
    * ONE expression tree used by both the recompute path
    * ([[bm25TopKBatchPlan]]) and the served-from-index path
    * ([[Bm25Index.bm25TopKBatchFromIndex]]), so "served ≡ recompute" is
    * exact by construction, never by parallel maintenance of two trees.
    * `withDf` carries (term, keyCols..., len, tf, df); `stats` is the
    * one-row (n_docs, avgdl) frame; `qterms` the (query_id, term) pairs.
    *
    * The contribution is QUERY-INDEPENDENT (query tf is ignored, the
    * standard short-query BM25), so it floor-quantizes to a ×10⁹
    * fixed-point long per (term, item) BEFORE the query join — the
    * joined frame (|matching items| × |queries|) then only sums longs
    * (order-independent exact integers) instead of re-deriving the
    * double tree per pair; the final top-k is a query-partitioned
    * WindowGroupLimit. */
  private[graft] def bm25BatchRank(
      withDf: DataFrame, stats: DataFrame, qterms: DataFrame,
      keyCols: Seq[String], k: Int, k1: Double, b: Double): DataFrame = {
    val perTerm = withDf
      .crossJoin(broadcast(stats))
      .select(col("term") +: keyCols.map(col) :+
        floor((((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") / (col("tf") +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * (col("len").cast("double") / col("avgdl"))))))
          * 1000000000L).cast("long").as("__c_fp"): _*)
    val contrib = perTerm.join(broadcast(qterms), Seq("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("bm25_fp").desc +: keyCols.map(col(_).asc): _*)
    contrib.groupBy(col("query_id") +: keyCols.map(col): _*)
      .agg(sum(col("__c_fp")).as("bm25_fp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Gopher-rules document quality filter (Rae et al. 2021, Appendix A):
    * the reference heuristic gate every web-scale corpus build applies
    * before model-based scoring. Per doc: word-count bounds, mean word
    * length bounds, alphabetic-word fraction, and a distinct-stop-word
    * floor, each emitted as its own flag plus the conjunctive `keep` —
    * flags stay visible so a filter audit can attribute every rejection.
    * One tokenization pass, no shuffle at all (a pure narrow map; the
    * caller adds presentation order): at 100 TB this is the cheapest
    * possible full-corpus pass. Arithmetic is exact longs plus two IEEE
    * divisions (mean length, alpha fraction), so an engine replica
    * hash-matches bit-exactly. */
  def gopherRules(
      docs: DataFrame, idCol: String, textCol: String,
      // Gopher's rule is "≥2 distinct words from a fixed function-word
      // list" (theirs: the/be/to/of/and/that/have/with). The driver corpus
      // carries exactly two function words, so the default list is
      // calibrated to it; real-corpus callers pass the full list.
      stops: Seq[String] = Seq("the", "a")): DataFrame =
    gopherRulesCarry(docs, idCol, textCol, stops, Nil)

  /** [[gopherRules]] with extra input columns CARRIED through the pass —
    * for pipelines (d79) that need the flags alongside other row columns:
    * carrying them avoids a corpus-sized join-back against the input
    * (the r21 d79 census: that join shuffled the text twice and
    * recomputed the planted-corpus construction on both sides). The flag
    * expressions are shared verbatim, so gopherRules' own output is
    * byte-identical. */
  private[graft] def gopherRulesCarry(
      docs: DataFrame, idCol: String, textCol: String,
      stops: Seq[String], carry: Seq[String]): DataFrame = {
    // a zero-token doc is REJECTED WITH FLAGS (n_words=0 fails ok_count),
    // never silently dropped — the audit contract is one output row per
    // input doc; the guarded divisions emit 0.0 instead of NaN there
    val n = size(col("toks"))
    // per-row tokenize/regex work fused into the scan stage — floor its
    // parallelism (r21, guide §2.6; no-op at scale)
    Par.floor(docs.select((idCol +: carry :+ textCol).distinct.map(col): _*),
        idCol)
      .select(col(idCol) +: carry.map(col) :+ tokens(col(textCol)).as("toks"): _*)
      .select(col(idCol) +: carry.map(col) :+
        n.cast("long").as("n_words") :+
        // total word chars via join-and-measure: replicable in any engine
        when(n > 0, length(concat_ws("", col("toks"))).cast("double") / n)
          .otherwise(lit(0.0)).as("mean_word_len") :+
        when(n > 0,
          size(filter(col("toks"), t => t.rlike("\\p{L}"))).cast("double") / n)
          .otherwise(lit(0.0)).as("alpha_frac") :+
        size(array_intersect(array_distinct(col("toks")),
          array(stops.map(lit): _*))).cast("long").as("n_stop"): _*)
      .withColumn("ok_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("ok_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.80)
      .withColumn("ok_stop", col("n_stop") >= 2)
      .withColumn("keep",
        col("ok_count") && col("ok_len") && col("ok_alpha") && col("ok_stop"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    * repetition half of the quality filter, complementing
    * [[gopherRules]]' length/alpha/stopword half: per doc, the fraction
    * of 2-gram occurrences taken by the MOST FREQUENT 2-gram (boilerplate
    * and spam repeat one phrase) and the fraction of 5-gram occurrences
    * that are duplicates of an earlier 5-gram (templated text repeats
    * long spans). Occurrence fractions, not Gopher's character fractions
    * — same signal, integer counts, exact in any engine. Entirely
    * ROW-LOCAL: n-gram multiplicities come from one
    * [[graft.functions.ValueCounts]] pass over the per-doc n-gram array
    * (no corpus-wide (doc, gram) shuffle — the d49/d48 kernel shape), so
    * the whole audit is a narrow map. One output row per input doc with
    * per-rule flags, the [[gopherRules]] audit contract. Fractions
    * degenerate on tiny docs (a 2-token doc's single 2-gram is 100%
    * concentrated by necessity) — Gopher applies these only past its
    * ≥50-word gate, so compose with [[gopherRules]]' ok_count. */
  def repetitionSignals(
      docs: DataFrame, idCol: String, textCol: String,
      top2Max: Double = 0.20, dup5Max: Double = 0.30): DataFrame = {
    import graft.functions.GraftFunctions.{valueCountsOf, wordNgramsOf}
    docs
      .select(col(idCol), wordNgramsOf(col(textCol), 2).as("g2"),
        wordNgramsOf(col(textCol), 5).as("g5"))
      .select(col(idCol),
        size(col("g2")).cast("long").as("n2"),
        coalesce(array_max(transform(valueCountsOf(col("g2")),
          x => x.getField("c"))), lit(0L)).as("top2"),
        size(col("g5")).cast("long").as("n5"),
        (size(col("g5")) - size(array_distinct(col("g5"))))
          .cast("long").as("dup5"))
      .select(col(idCol), col("n2"), col("top2"),
        when(col("n2") > 0, col("top2").cast("double") / col("n2"))
          .otherwise(lit(0.0)).as("top2_frac"),
        col("n5"), col("dup5"),
        when(col("n5") > 0, col("dup5").cast("double") / col("n5"))
          .otherwise(lit(0.0)).as("dup5_frac"))
      .withColumn("ok_top2", col("top2_frac") <= top2Max)
      .withColumn("ok_dup5", col("dup5_frac") <= dup5Max)
      .withColumn("keep", col("ok_top2") && col("ok_dup5"))
  }

  /** BPE vocabulary induction, one merge iteration (Sennrich et al. 2016
    * §3.2): the top-k most frequent adjacent symbol pairs across the
    * corpus, ranked as merge candidates. Uses the classic BPE scaling
    * trick — the corpus-sized work is ONE tokenization + word-count pass
    * (map-side combined, the only big shuffle); pair extraction then runs
    * over the DISTINCT vocabulary, whose size is corpus-independent
    * (tens of thousands of rows at 100 TB, a rounding error), weighted by
    * word frequency. The naive alternative — exploding char pairs per
    * corpus token — shuffles |corpus tokens| × |word length| rows and is
    * exactly what this shape avoids. Counts are exact longs; the ORDER BY
    * tie-breaks on the (unique) pair so the top-k boundary is
    * deterministic; the limit plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). */
  def bpeMergeCandidates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val wc = docs
      .select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    wc
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("c"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(
        col("w").substr(col("i"), lit(1)).as("a"),
        col("w").substr(col("i") + 1, lit(1)).as("b"),
        col("c"))
      .groupBy("a", "b").agg(sum(col("c")).as("freq"))
      .orderBy(col("freq").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Cavnar–Trenkle rank-order language classification (d49 — "N-Gram-
    * Based Text Categorization", 1994): per-language profiles are the
    * `profileSize` most frequent character 3-grams of that language's
    * labeled corpus, ranked; a document classifies to the language whose
    * profile minimizes the OUT-OF-PLACE distance — Σ over the document's
    * own top-`profileSize` grams of |doc rank − profile rank|, with a
    * `profileSize` penalty for grams absent from the profile. All-integer
    * arithmetic and (count DESC, gram ASC) rank tie-breaks make the whole
    * pipeline hash-exact across engines — no floats anywhere.
    *
    * Scale shape: a document's gram histogram is a PURE PER-ROW
    * computation — every gram lives in the row's own text — so the doc
    * profile is built with [[graft.functions.CharNGramCounts]] (one
    * O(len + d·log d) kernel emitting the distinct grams already in
    * (count DESC, gram ASC) rank order) and a row-local `slice`: no
    * explode, no shuffle, no window. The round-12 form built the same
    * profile via explode + groupBy(doc, gram) + row_number window — a
    * corpus-wide shuffle of |grams| rows that was ~2 s of the 3.5 s
    * bench row and would be the dominant exchange at 100 TB. Only the
    * LANGUAGE profile needs a shuffle (global sums per (lang, gram)),
    * and that one is map-side combinable into a key space bounded by
    * |langs| × |gram vocabulary| — corpus-independent. The finished
    * profile (langs × profileSize rows, KBs) is collected and re-lifted
    * as a literal relation so its subtree is never recomputed; the
    * classification join is doc-profile rows (≤ profileSize per doc)
    * against the BROADCAST profile table. Output: (id, pred_lang, dist)
    * per document. */
  def ctLangId(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      profileSize: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = profileSize
    val spark = docs.sparkSession
    // ONE corpus pass: per-doc histograms, row-local, pre-sorted in rank
    // order. Materialized (docs-count rows, top-n structs each) because
    // both the lang-profile build and the classification read it.
    val hist = Par.floor(
        docs.select(col(idCol), col(langCol), col(textCol)), idCol)
      .select(col(idCol), col(langCol),
        // the per-row O(len + d·log d) histogram kernel is the corpus
        // pass — floor its scan parallelism (r21, guide §2.6)
        graft.functions.GraftFunctions.charNgramCountsOf(col(textCol), 3)
          .as("gc"))
      .localCheckpoint()
    // Language profiles: global (lang, gram) sums need the one real
    // shuffle; partial hash-agg combines map-side into the (small)
    // language × vocabulary key space before the exchange.
    val wL = Window.partitionBy(col(langCol))
      .orderBy(col("c").desc, col("g").asc)
    val langProfRows = hist.select(col(langCol), explode(col("gc")).as("e"))
      .groupBy(col(langCol), col("e.g").as("g"))
      .agg(sum(col("e.c")).as("c"))
      .withColumn("r_lang", row_number().over(wL))
      .filter(col("r_lang") <= n)
      .select(col(langCol).cast("string").as("plang"), col("g"),
        col("r_lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    import spark.implicits._
    val langProf = langProfRows.toDF("plang", "g", "r_lang")
    // Doc profile: top-n prefix of the pre-ranked histogram; rank is the
    // array position. posexplode keeps it one narrow Generate.
    val docProf = hist.select(col(idCol), posexplode(slice(col("gc"), 1, n)))
      .select(col(idCol), col("col.g").as("g"),
        (col("pos") + 1).cast("int").as("r_doc"))
    val matched = docProf.join(broadcast(langProf), "g")
      .groupBy(col(idCol), col("plang"))
      .agg(count(lit(1)).as("m"),
        sum(abs(col("r_doc") - col("r_lang"))).as("sd"))
    // Dense (doc × lang) distances: langs is a literal list, so the
    // cross join broadcasts a handful of rows; docs with no matched
    // grams for a language fall back to the all-out-of-place distance
    // gsize·n via the left join's null side.
    val langs = langProfRows.map(_._1).distinct.sorted.toDF("plang")
    val docSize = hist.select(col(idCol),
      least(size(col("gc")), lit(n)).cast("long").as("gsize"))
    val dense = docSize.crossJoin(broadcast(langs))
      .join(matched, Seq(idCol, "plang"), "left")
      .select(col(idCol), col("plang"),
        (coalesce(col("sd"), lit(0L)) +
          (col("gsize") - coalesce(col("m"), lit(0L))) * n).as("dist"))
    val wP = Window.partitionBy(col(idCol))
      .orderBy(col("dist").asc, col("plang").asc)
    dense.withColumn("__rn", row_number().over(wP))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("plang").as("pred_lang"), col("dist"))
  }

  /** Driver-bounded (word, count) vocabulary — the distributed cut that
    * keeps [[bpeLearnCollected]]'s collect finite at any corpus size: drop
    * words below `minFreq`, keep the `maxVocab` most frequent (ties: word
    * ASC), all DISTRIBUTED-side via a map-side top-k
    * (TakeOrderedAndProject), so the driver never holds more than
    * `maxVocab` rows however unbounded the distinct-word tail grows. */
  def bpeVocab(
      docs: DataFrame, textCol: String,
      minFreq: Long = 1L, maxVocab: Int = 1 << 20): DataFrame =
    docs.select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minFreq)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)

  /** Separator for the BPE symbol-boundary encoding: each symbol is
    * wrapped `␟sym␟`, so adjacent symbols read `…sym␟␟next…` and a merge
    * (a, b) is the LITERAL replace `␟a␟␟b␟ → ␟ab␟` — boundary-aware
    * (a later merge can only fire on adjacent whole SYMBOLS, never inside
    * one) and identical left-to-right non-overlapping semantics in every
    * engine's `replace`, which is what makes the d48 oracle a plain
    * list-fold in DuckDB. U+001F never appears in text. */
  private val SEP = "\u001F"

  /** Apply an ORDERED merge list to a word: array of BPE tokens.
    * Pure expression fold — each merge is one literal `replace` on the
    * wrapped form; meant to run on the DISTINCT vocab (corpus-independent
    * rows), never per corpus token. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(word, "(.)", SEP + "$1" + SEP)
    val folded = merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(SEP + a + SEP + SEP + b + SEP), lit(SEP + a + b + SEP))
    }
    filter(
      transform(split(folded, SEP + SEP), x => replace(x, lit(SEP), lit(""))),
      x => x =!= "")
  }

  /** Classic iterative BPE learning (Sennrich et al. 2016): `numMerges`
    * rounds of pick-most-frequent-adjacent-pair-and-merge. The corpus-
    * sized work is ONE distributed word-count pass; the (word, count)
    * vocabulary — corpus-independent size, the same driver-held-artifact
    * shape as the ANN codebooks — is collected and the merge rounds run
    * locally (how sentencepiece/HF learn too: vocab fits one machine even
    * at 100 TB corpus scale). Pair pick order: freq DESC, then (a, b)
    * ASC — fully deterministic. Merging is left-to-right non-overlapping,
    * matching [[bpeApply]] exactly, so learn-then-apply round-trips.
    *
    * The collect is BOUNDED distributed-side: words below `minFreq` drop
    * and only the `maxVocab` most frequent (ties: word ASC, so the cut is
    * deterministic) survive, via a map-side top-k (TakeOrderedAndProject)
    * — at 100 TB the distinct-"word" tail (typos, URLs, hashes) is
    * unbounded, and an uncapped collect is a driver OOM. Effect on merge
    * picks: a dropped word only removes its own ≤ minFreq (or
    * below-cut-frequency) contribution from pair counts, so picks can
    * only change where two pair frequencies sit within the truncated
    * tail's total mass of each other — on any corpus whose vocabulary
    * fits the cap (every test SF), picks are IDENTICAL. */
  def bpeLearnCollected(
      docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 1L, maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    val wc = bpeVocab(docs, textCol, minFreq, maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    def mergeWord(syms: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.size < numMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairs(k) = pairs.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val (a, b) = pairs.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, c) => (mergeWord(syms, a, b), c) }
      }
    }
    merges.toSeq
  }

  /** Tokenize the corpus with a learned merge list — the ENCODE side of
    * BPE (d48), the tokenizer the token-count/packing rows approximate.
    * Scale shape: merges apply on the DISTINCT vocabulary only (greedy
    * fold per unique word); the corpus side carries per-(doc, DISTINCT
    * word) COUNT rows, not per-token rows — the word histogram is a pure
    * per-row computation ([[graft.functions.WordCounts]], same rewrite
    * as d49's gram histograms), so the explode, the broadcast vocab→
    * corpus join, and the per-doc aggregate all see vocabulary-bounded
    * rows per doc (~6× fewer on this corpus; the gap widens with doc
    * length). Totals re-weight by the count: n_words = Σc,
    * n_bpe_tokens = Σ nt·c — integer algebra, identical to the
    * per-token formulation. Output: (id, n_words, n_bpe_tokens). */
  def bpeTokenize(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docWords = docs.select(col(idCol),
        explode(graft.functions.GraftFunctions.wordCountsOf(col(textCol)))
          .as("e"))
      .select(col(idCol), col("e.g").as("w"), col("e.c").as("cnt"))
    val vocab = docWords.select("w").distinct()
      .select(col("w"), size(bpeApply(col("w"), merges)).as("nt"))
    docWords.join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("nt").cast("long") * col("cnt")).as("n_bpe_tokens"))
  }

  /** Convenience: documents table → enriched analysis frame. */
  /** ONE-SCAN per-document quality-signal bundle — the RedPajama-V2
    * "quality signals" table pattern: at 100 TB the only sane way to
    * produce N per-doc signals is ONE pass emitting all of them, not N
    * passes re-reading the corpus. Emits the d02/d11 quality features and
    * score, d03 language id, d04 fingerprint key, and d54's repetition
    * fractions, all ROW-LOCAL (the ValueCounts kernel keeps the 2-gram
    * histogram inside the row) — the whole bundle is a narrow map with no
    * Exchange and no Join, plan-pinned in OperatorsSpec. */
  def signalBundle(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.GraftFunctions.{valueCountsOf, wordNgramsOf}
    val t = col(textCol)
    val base = qualityFeatures(t).foldLeft(docs.select(col(idCol), t)) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    base
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fp_key", fingerprintKey(t))
      .withColumn("__g2", wordNgramsOf(t, 2))
      .withColumn("__g5", wordNgramsOf(t, 5))
      .withColumn("top2_frac", when(size(col("__g2")) > 0,
        coalesce(array_max(transform(valueCountsOf(col("__g2")),
          x => x.getField("c"))), lit(0L)).cast("double") /
          size(col("__g2"))).otherwise(lit(0.0)))
      .withColumn("dup5_frac", when(size(col("__g5")) > 0,
        (size(col("__g5")) - size(array_distinct(col("__g5"))))
          .cast("double") / size(col("__g5"))).otherwise(lit(0.0)))
      .drop("__g2", "__g5", textCol)
  }

  /** Corpus datasheet — the dataset-card rollup every released corpus
    * ships (Dolma's summary tables, RedPajama's per-source counts, the
    * "Datasheets for Datasets" accounting of Gebru et al. 2021): per
    * (source, lang) cell plus ROLLUP margins, one scan emits doc count,
    * token and char totals, the quality-kept count at `qualityThreshold`,
    * and the fixed-point quality-score sum (so a mean is derivable
    * without an order-dependent double accumulation — the exact-integer
    * contract that makes the whole table engine-portable).
    *
    * Scale shape: the per-row signals are the narrow [[signalBundle]]
    * projections; ROLLUP is one partial-aggregable Expand×3 over the
    * tiny (source, lang) key space — the only shuffle carries
    * |sources|×|langs| rows. `grouping()` flags disambiguate margin rows
    * from literal values. */
  private def datasheetBase(
      docs: DataFrame, srcCol: String, langCol: String,
      textCol: String): DataFrame = {
    // a null text must count as an empty doc (0 tokens/chars, lowest
    // quality), not silently drop out of the SUM aggregates while still
    // counting in n_docs — the card's columns must stay consistent
    val t = coalesce(col(textCol), lit(""))
    docs.select(col(srcCol), col(langCol),
      tokenCount(t).cast("long").as("__nt"),
      length(t).cast("long").as("__nc"),
      qualityScore(t).as("__q"))
  }

  private def datasheetAggs(qualityThreshold: Double) = Seq(
    count(lit(1)).as("n_docs"),
    sum(col("__nt")).as("n_tokens"),
    sum(col("__nc")).as("n_chars"),
    sum(when(col("__q") >= lit(qualityThreshold), 1L).otherwise(0L))
      .as("n_quality_kept"),
    sum(floor(col("__q") * 10000).cast("long")).as("q_sum_fp"))

  def datasheet(
      docs: DataFrame, srcCol: String, langCol: String, textCol: String,
      qualityThreshold: Double = 0.5): DataFrame = {
    val aggs = Seq(
      grouping(col(srcCol)).cast("int").as("g_src"),
      grouping(col(langCol)).cast("int").as("g_lang")) ++
      datasheetAggs(qualityThreshold)
    datasheetBase(docs, srcCol, langCol, textCol)
      .rollup(col(srcCol), col(langCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The LEAF CELLS of [[datasheet]] (no ROLLUP margins, no grouping
    * flags) — the key-unique roll-up shape streaming maintenance needs:
    * every measure is a plain integer sum, so per-batch cells merge into
    * maintained state by column-wise addition
    * ([[graft.operators.MvMaintain.merge]] "sum" algebra) and the
    * maintained card equals the batch card at every commit. Margins are
    * derivable from the cells, so the stream never carries them. */
  def datasheetCells(
      docs: DataFrame, srcCol: String, langCol: String, textCol: String,
      qualityThreshold: Double = 0.5): DataFrame = {
    val aggs = datasheetAggs(qualityThreshold)
    datasheetBase(docs, srcCol, langCol, textCol)
      .groupBy(col(srcCol), col(langCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Reconstruct the FULL [[datasheet]] card (cells + ROLLUP margins +
    * grouping flags) from leaf cells alone — the proof behind the s24
    * contract that margins never need to ride the stream: every measure
    * is a sum (n_docs included), so margins are re-aggregations of the
    * cells. `datasheetFromCells(datasheetCells(docs)) ≡ datasheet(docs)`
    * row-for-row (OperatorsSpec pins it), which is also why the
    * maintained streaming state can serve the whole card at any commit. */
  def datasheetFromCells(cells: DataFrame, srcCol: String,
      langCol: String): DataFrame =
    cells
      .rollup(col(srcCol), col(langCol))
      .agg(
        grouping(col(srcCol)).cast("int").as("g_src"),
        grouping(col(langCol)).cast("int").as("g_lang"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_quality_kept")).as("n_quality_kept"),
        sum(col("q_sum_fp")).as("q_sum_fp"))

  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val withFeats = qualityFeatures(t).foldLeft(docs) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    withFeats
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint64(t))
  }

}
