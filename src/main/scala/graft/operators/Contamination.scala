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
    // shingling is per-row tokenize+hash work fused into the corpus scan
    // stage — floor its parallelism (r21, guide §2.6; no-op at scale)
    Par.floor(corpus.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"),
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

  /** [[contaminationScores]] with a BLOOM pre-screen — the variant for
    * when the benchmark's exact shingle set outgrows a comfortable
    * broadcast (a full eval SUITE can be millions of shingles): a
    * fixed-size Bloom filter over the benchmark hashes broadcasts
    * instead (Spark's own BloomFilterAggregate/BloomFilterMightContain —
    * the machinery behind its runtime join filters), corpus shingles
    * that cannot match drop BEFORE the exact confirm join, and only the
    * surviving candidates (≈ true hits + fpp of the corpus) pay it.
    * Result-IDENTICAL to [[contaminationScores]]: Bloom filters have no
    * false negatives, and the confirm join removes the false positives —
    * the d50 oracle is therefore the same SQL as d12's. n_shingles is
    * computed ROW-LOCALLY (shingle hashes are per-doc distinct), so the
    * pre-screen prunes the join input without undercounting the
    * denominator. */
  def contaminationScoresBloom(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      expectedItems: Long = 1000000L): DataFrame = {
    val (bench, bloomBytes) =
      prepBenchmark(benchmark, textCol, shingleN, expectedItems)
    contaminationScoresPrepped(corpus, bench, bloomBytes, idCol, textCol,
      shingleN)
  }

  /** The benchmark side prepped ONCE for a long-lived gate (e.g. a
    * streaming decontamination serving path, where recomputing the
    * benchmark aggregate per micro-batch would waste a full benchmark
    * scan each trigger): the distinct shingle-hash frame plus its
    * fixed-size Bloom bytes (null when the benchmark has no shingles).
    * Hand both to [[contaminationScoresPrepped]] per batch. */
  def prepBenchmark(
      benchmark: DataFrame, textCol: String, shingleN: Int = 3,
      expectedItems: Long = 1000000L): (DataFrame, Array[Byte]) = {
    import org.apache.spark.sql.GraftPlanBridge.{exprOf, ofExpr}
    val bench = benchmark
      .select(explode(Dedup.shingleHashes(col(textCol), shingleN)).as("sh"))
      .distinct()
    val bloomAgg = ofExpr(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprOf(col("sh")), expectedItems)
        .toAggregateExpression())
    (bench, bench.select(bloomAgg.as("bf")).head.getAs[Array[Byte]](0))
  }

  /** [[contaminationScoresBloom]]'s scoring body against an already-
    * prepped benchmark — no benchmark-side action, so it is safe to call
    * per micro-batch. The confirm join broadcasts the exact benchmark
    * shingle set — right when the benchmark is an eval suite. */
  def contaminationScoresPrepped(
      corpus: DataFrame, bench: DataFrame, bloomBytes: Array[Byte],
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame =
    contaminationScoresPreppedImpl(corpus, bench, bloomBytes, idCol,
      textCol, shingleN, broadcastConfirm = true)

  /** [[contaminationScoresPrepped]] with the confirm join UNHINTED — the
    * variant for a CORPUS-SIZED "benchmark" (e.g. [[leakFreeSplit]]'s test
    * split, ~6% of the corpus itself): the fixed-size Bloom still
    * broadcasts and prunes non-candidates before any exchange, but the
    * exact confirm join carries no `broadcast()` hint, so Catalyst/AQE is
    * free to pick a shuffled (sort-merge) join when the bench side
    * outgrows the broadcast threshold. Result-identical to the hinted
    * path (same no-false-negatives + exact-confirm argument as d50;
    * OperatorsSpec pins equality, PlansSpec pins the no-hint plan shape). */
  def contaminationScoresPreppedShuffled(
      corpus: DataFrame, bench: DataFrame, bloomBytes: Array[Byte],
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame =
    contaminationScoresPreppedImpl(corpus, bench, bloomBytes, idCol,
      textCol, shingleN, broadcastConfirm = false)

  private def contaminationScoresPreppedImpl(
      corpus: DataFrame, bench: DataFrame, bloomBytes: Array[Byte],
      idCol: String, textCol: String, shingleN: Int,
      broadcastConfirm: Boolean): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge.{exprOf, ofExpr}
    // same scan-stage shingling floor as contaminationScores (r21 §2.6)
    val perDoc = Par.floor(
        corpus.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"),
        Dedup.shingleHashes(col(textCol), shingleN).as("shs"))
    val matched =
      if (bloomBytes == null) {
        // empty benchmark → empty bloom → nothing can match; derive the
        // empty frame from perDoc's own schema so a non-long idCol still
        // joins without coercion
        perDoc.select(col("doc_id")).limit(0)
          .withColumn("n_matched", lit(0L))
      } else {
        val mightContain = ofExpr(
          new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            exprOf(lit(bloomBytes)), exprOf(col("sh"))))
        val confirm = bench.withColumn("__hit", lit(1))
        perDoc.select(col("doc_id"), explode(col("shs")).as("sh"))
          .filter(mightContain)
          .join(if (broadcastConfirm) broadcast(confirm) else confirm,
            Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matched"))
      }
    // coalesce: a null text yields null shingles — score it 0-of-0 like
    // contaminationScores' explode_outer path does
    perDoc.select(col("doc_id"),
        coalesce(size(col("shs")), lit(0)).cast("long").as("n_shingles"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_matched").cast("double") /
          when(col("n_shingles") > 0, col("n_shingles")), lit(0.0))
          .as("contamination"))
  }

  /** VECTOR decontamination — the embedding-space complement of the
    * shingle paths above: shingle matching is exact-overlap only, so a
    * PARAPHRASED benchmark passage (reworded, re-punctuated, translated
    * back) sails through [[contaminationScores]] while its embedding stays
    * nearly collinear with the benchmark's. Flag every corpus row whose
    * max cosine against ANY benchmark vector reaches `threshold` — the
    * embedding-similarity decontamination pass of modern eval-hygiene
    * pipelines (e.g. the fuzzy dedup stage of GPT-3 appendix C, done in
    * vector space).
    *
    * Scale shape: identical to [[Similarity.bruteForceTopK]] — the
    * benchmark side is an eval set (small by construction) and broadcasts;
    * ONE corpus scan computes the pairwise cosines row-locally; the
    * per-pair filter at `threshold` prunes before the doc-id max-agg, so
    * the only shuffle carries already-flagged (id, cos) rows. No corpus
    * self-join.
    *
    * Determinism: the threshold compares the floor-quantized cosine
    * (`floor(cos·10⁴)/10⁴` — the e01 recipe), so flag decisions and the
    * reported `max_cos_q` are bit-identical in any engine; thresholds
    * should sit away from attainable quantized values (0.9 against ≈1.0
    * planted copies and ≤0.5 natural neighbors). Output: (idCol,
    * max_cos_q) of flagged rows only. */
  def vectorContaminated(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    val b = benchmark.select(col(vecCol).as("__bv"))
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .crossJoin(broadcast(b))
      .select(col(idCol),
        (floor(graft.functions.GraftFunctions.cosineF32(
          col("__cv"), col("__bv")) * 10000) / 10000).as("cos_q"))
      .filter(col("cos_q") >= threshold)
      .groupBy(col(idCol))
      .agg(max(col("cos_q")).as("max_cos_q"))
  }

  /** Leak ATTRIBUTION — the report behind [[contaminationScores]]'s
    * number: not just "this doc overlaps the eval suite" but WHICH
    * benchmark document it carries, so the eval owner knows which task
    * is compromised. For every corpus doc sharing at least `minShared`
    * distinct shingles with some benchmark doc, emit the best-matching
    * benchmark doc (most shared shingles; ties → lowest bench id):
    * `(doc_id, bench_id, n_shared)`.
    *
    * Scale shape: the benchmark's (shingle, bench_id) table broadcasts
    * (eval-suite-sized); one corpus scan explodes per-doc distinct
    * shingles into the broadcast join; the only shuffle is the
    * (doc, bench) count — bounded by actual overlap pairs, not the
    * corpus. Integer counts + deterministic tie-break → hash-exact. */
  def leakAttribution(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      minShared: Int = 2): DataFrame = {
    require(minShared >= 1)
    val bench = benchmark
      .select(col(idCol).as("bench_id"),
        explode(Dedup.shingleHashes(col(textCol), shingleN)).as("sh"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("n_shared").desc, col("bench_id").asc)
    corpus
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingleHashes(col(textCol), shingleN)).as("sh"))
      .join(broadcast(bench), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Leakage-FREE train/test split — the eval-hygiene split step: a
    * deterministic hash split ([[Sampling.bernoulliSample]]'s md5-digit
    * contract) assigns each doc to test (`hex < testSixteenths`) or
    * train, then train docs contaminated by the TEST side (shingle
    * containment ≥ `threshold`, the d12 scoring) are DROPPED — near-dups
    * of test documents never reach training, so eval numbers measure
    * generalization, not memorization of split-straddling duplicates.
    * Output: surviving rows with a `split` column. */
  def leakFreeSplit(
      docs: DataFrame, idCol: String, textCol: String,
      testSixteenths: Int, threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    require(testSixteenths >= 1 && testSixteenths <= 15)
    // the d13/bernoulliSample character-comparison contract
    val cutoff = "0123456789abcdefg".charAt(testSixteenths).toString
    val tagged = docs.withColumn("split",
      when(substring(md5(col(idCol).cast("string")), 1, 1) < lit(cutoff),
        lit("test")).otherwise(lit("train")))
    val test = tagged.filter(col("split") === "test")
    val train = tagged.filter(col("split") === "train")
    val clean = decontaminateScaled(train, test, idCol, textCol,
      threshold, shingleN)
    clean.unionByName(test)
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

  /** [[decontaminate]] for a benchmark that is itself corpus-sized (the
    * [[leakFreeSplit]] case — the "benchmark" is the corpus's own test
    * split, which at 100 TB is terabytes of text whose exact shingle set
    * CANNOT broadcast): the only driver-held benchmark artifact is the
    * fixed-size Bloom from [[prepBenchmark]] (size set by `expectedItems`,
    * not by the data), and the exact confirm join runs UNHINTED
    * ([[contaminationScoresPreppedShuffled]]) so it degrades to a shuffled
    * sort-merge join instead of a driver OOM. Result-identical to
    * [[decontaminate]] at every scale (Bloom has no false negatives; the
    * confirm join is exact). */
  def decontaminateScaled(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5, shingleN: Int = 3,
      expectedItems: Long = 1000000L): DataFrame = {
    val (bench, bloomBytes) =
      prepBenchmark(benchmark, textCol, shingleN, expectedItems)
    val dirty = contaminationScoresPreppedShuffled(corpus, bench, bloomBytes,
        idCol, textCol, shingleN)
      .filter(col("contamination") >= threshold)
      .select(col("doc_id").as(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
