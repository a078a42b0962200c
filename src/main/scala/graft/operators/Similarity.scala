package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * - [[bruteForceTopK]]: exact baseline — broadcast the (small) probe set,
  *   score every corpus row with the native cosine kernel, windowed top-k.
  *   One pass over the corpus, no corpus shuffle of the embedding column
  *   beyond the top-k aggregation; the probe side is broadcast so the
  *   corpus never moves. This is the 100 TB-sane exact plan.
  * - [[srpTopK]]: sign-random-projection (hyperplane) LSH — corpus is
  *   bucketed by an nBits-bit sketch once (reusable, e.g. written as a
  *   bucketed table); probes only score their own bucket ± multi-probe
  *   neighbors, trading recall for a candidate set ~bucketShare of the
  *   corpus.
  * - [[ivfTopK]]: IVF-style coarse quantizer — corpus assigned to the
  *   nearest of `nCells` centroid rows, probes scan `nProbe` nearest cells.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe row.
    * Output: (probe_id, neighbor_id, cosine, rank). Excludes self-matches.
    * Ties broken by neighbor id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // the streamed side of the broadcast nested-loop join carries the
    // O(|corpus|·|probes|) cosine work — floor its scan parallelism
    // (r21, guide §2.6; no-op at scale, see Par.floor)
    val c = Par.floor(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id")
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("pv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** int8-served kNN: rank by the cosine of the QUANTIZED vectors — the
    * integer dot product and integer norms are computed straight from the
    * int8 codes ([[Quantize.int8Codes]]); the per-vector dequantization
    * scales cancel in the cosine ratio, so serving never touches fp32.
    * This is the memory-bandwidth serving path: at 100 TB the embedding
    * column is usually the widest thing in the table, and int8 cuts the
    * bytes scanned per query 4× while the e13 recall gate MEASURES what
    * that costs in ranking fidelity. Plan shape identical to
    * [[bruteForceTopK]]: probes broadcast, one corpus scan, WindowGroupLimit
    * top-k; arithmetic is the codegen'd dot_i8/normsq_i8 kernels over the
    * tinyint array (integer-exact, norms computed once per side). */
  def int8TopK(
      corpusCodes: DataFrame, probeCodes: DataFrame,
      idCol: String, codesCol: String, k: Int): DataFrame = {
    // norms computed ONCE per side in the scan (integer-exact, so the
    // cosine values are bit-identical to per-pair recomputation) and the
    // dot is the codegen'd dot_i8 kernel — the HOF aggregate(zip_with)
    // formulation is CodegenFallback and re-enters the interpreter per
    // element on the corpus×probes hot path
    val c = Par.floor(corpusCodes.select(col(idCol).as("neighbor_id"),
      col(codesCol).as("cq"),
      sqrt(normSqI8(col(codesCol)).cast("double")).as("__cn")),
      "neighbor_id")
    val p = probeCodes.select(col(idCol).as("probe_id"),
      col(codesCol).as("pq"),
      sqrt(normSqI8(col(codesCol)).cast("double")).as("__pn"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dotI8(col("pq"), col("cq")).cast("double") /
          (col("__pn") * col("__cn"))).as("cosine_q"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_q").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** kNN label agreement — label-noise screening / embedding-space quality
    * eval (the neighbor-agreement heuristic behind Wilson's editing rule
    * and Confident-Learning-style mislabel detection): for each probe, take
    * its k nearest corpus neighbors by cosine, majority-vote their labels
    * (ties break to the SMALLEST label — deterministic, engine-portable),
    * and compare against the probe's own label. Probes whose neighborhoods
    * vote against them are mislabel/outlier candidates; corpus-level
    * agreement rate tracks how well the embedding space separates labels.
    *
    * Output: (probe_id, own_label, majority_label, majority_votes, agrees).
    *
    * Scale path: identical to [[bruteForceTopK]] — probes broadcast against
    * ONE corpus scan, per-probe windowed top-k (WindowGroupLimit heaps, no
    * full sort), then a label join + vote aggregate over k·probes rows. At
    * corpus×corpus scale, feed the ANN shortlist (e05 IVF / e10 IVFADC)
    * instead of the exact ranking — majority agreement is robust to
    * approximate neighbor sets. */
  def knnLabelAgreement(
      emb: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(emb, probes, idCol, vecCol, k)
    val nLbl = emb.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"))
    val votes = nn.join(nLbl, Seq("neighbor_id"))
      .groupBy(col("probe_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("votes").desc, col("n_label").asc)
    val maj = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("probe_id"), col("n_label").as("majority_label"),
        col("votes").as("majority_votes"))
    maj.join(probes.select(col(idCol).as("probe_id"),
        col(labelCol).as("own_label")), Seq("probe_id"))
      .select(col("probe_id"), col("own_label"), col("majority_label"),
        col("majority_votes"),
        (col("own_label") === col("majority_label")).as("agrees"))
  }

  /** Contrastive-pair mining for embedding-model training: per anchor
    * (probe), the top-`kNeg` nearest neighbors with a DIFFERENT label —
    * the hard negatives that make contrastive losses work (random
    * negatives are trivially separable; the informative ones are the
    * near-misses) — plus the nearest SAME-label neighbor as the positive.
    * Output: (probe_id, role 'pos'|'neg', rank, neighbor_id, cosine).
    *
    * Plan shape = [[bruteForceTopK]]: anchors broadcast, ONE corpus scan,
    * per-(anchor, label-match) windowed top-k (WindowGroupLimit heaps).
    * At corpus×corpus scale, mine from the ANN shortlist (e05/e10)
    * instead of the exact ranking — hard-negative quality degrades
    * gracefully with shortlist recall. */
  def contrastivePairs(
      emb: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      kNeg: Int): DataFrame = {
    val c = Par.floor(
      emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("n_label")), "neighbor_id")
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      col(labelCol).as("p_label"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (col("n_label") === col("p_label")).as("same"),
        cosineF32(col("pv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"), col("same"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter((col("same") && col("rank") === 1) ||
        (!col("same") && col("rank") <= kNeg))
      .select(col("probe_id"),
        when(col("same"), "pos").otherwise("neg").as("role"),
        col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Exact maximum-inner-product search (MIPS): top-k by raw dot product —
    * the retrieval scoring used when embeddings are NOT length-normalized
    * (e.g. DPR-style trained encoders, where vector norm carries signal and
    * cosine would erase it). Same 100 TB plan shape as [[bruteForceTopK]]:
    * probes broadcast, corpus streamed once, windowed top-k (compiles to
    * WindowGroupLimit — per-partition heaps, no full sort). To reduce MIPS
    * to the cosine LSH path at scale, apply the standard norm-augmentation
    * transform (append sqrt(M² − ‖x‖²) to each corpus vector, 0 to probes)
    * and feed [[srpTopK]]. */
  def bruteForceTopKInnerProduct(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // same streamed-side parallelism floor as bruteForceTopK
    val c = Par.floor(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id")
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        dotF32(col("pv"), col("cv")).as("dot"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** nBits-bit sign-random-projection sketch of a vector: bit i is the sign
    * of the dot product with pseudo-random hyperplane i. Hyperplanes are
    * derived deterministically from the seed (fmix64-derived ±1
    * components), so corpus and probes agree without sharing state. Thin
    * wrapper over the single-pass [[graft.functions.SrpBandKeys]] kernel
    * with one band (the earlier HOF formulation hashed a string per
    * (bit, dimension) component — hundreds of allocations per row).
    * Limits vs the old HOF form: nBits ≤ 60, and a NULL embedding sketches
    * to NULL (the row drops out of bucketed joins) rather than bucket 0 —
    * filter or impute null vectors upstream. */
  def srpSketch(vec: Column, nBits: Int, seed: Long): Column =
    element_at(srpBandKeys(vec, 1, nBits, seed), 1)

  /** Banded SRP-LSH ANN (OR-amplified, like [[Dedup.embeddingNearDups]]):
    * corpus and probes each get `bands` independent bitsPerBand-bit
    * sketches; a corpus row becomes a candidate for a probe when any band
    * key matches, candidates are scored with exact cosine, and the top-k
    * survive. Two broadcast joins against the (small) probe side — the
    * corpus is never shuffled on vectors, only the O(candidates) pair set
    * moves. Recall rises with `bands` and falls with `bitsPerBand`
    * (candidate share does the opposite): the earlier single-bucket form
    * (bands=1) had recall ≈ 0.06 on uniform-ish embeddings whose true
    * top-k sit at cosine ≈ 0.35 — the hard LSH regime; 32×6 banding
    * measures ≈ 0.78 at sf0.01/sf0.1 (gated by the e02 recall row). For
    * corpora with genuine near-dup structure (cosine → 1) recall → 1 and
    * a higher bitsPerBand keeps the candidate share sublinear. */
  def srpTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 32, bitsPerBand: Int = 6, seed: Long = 42L): DataFrame = {
    val keysOf = (df: DataFrame, idAs: String) =>
      df.select(col(idCol).as(idAs),
          posexplode(srpBandKeys(col(vecCol), bands, bitsPerBand, seed)))
        .toDF(idAs, "band", "key")
    val cands = keysOf(corpus, "neighbor_id")
      .join(broadcast(keysOf(probes, "probe_id")), Seq("band", "key"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    val scored = cands
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      .join(broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))),
        "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("pv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic seeded k-means coarse quantizer for [[ivfTopK]]:
    * `k` spherical-k-means rounds (cosine assignment, mean update — the
    * cosine kernel normalizes, so means need no explicit re-normalization).
    *
    * Determinism/scale shape: initial centroids are the `k` corpus rows
    * with the lowest `xxhash64(id, seed)` (a seeded pseudo-random draw —
    * TakeOrderedAndProject, no full sort); each round assigns ROW-LOCALLY
    * via the baked-argmax pattern ([[kmeansRound]] — the codebook rides
    * the expression as literals, no join, no shuffle) and recomputes
    * means by `posexplode` + per-(cell, dim) average — the round's ONLY
    * exchange moves k×dim partial means, never corpus rows.
    * Centroids are collected to the driver between rounds (k×dim floats —
    * the same driver-held-centroids shape MLlib's k-means uses), which
    * also truncates lineage for free. Cells that lose every member keep
    * their previous centroid. Output: (cell_id 0..k-1, centroid). */
  def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3, seed: Long = 42L): DataFrame =
    centroidsDF(corpus.sparkSession,
      kmeansCentroidsCollected(corpus, idCol, vecCol, k, iters, seed))

  /** Driver-held form of a trained coarse quantizer (k×dim floats). The
    * codebook is the ANN system's INDEX: at scale it is trained once,
    * offline, and every query reuses it — callers memoize this Seq per
    * corpus and rebuild the tiny broadcast frame via [[centroidsDF]]. */
  def kmeansCentroidsCollected(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3, seed: Long = 42L): Seq[(Long, Array[Float])] = {
    var cents: Seq[(Long, Array[Float])] =
      corpus.select(col(idCol), col(vecCol))
        .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
        .limit(k)
        .collect()
        .zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toArray) }
        .toSeq
    for (_ <- 1 to iters) {
      val means = kmeansRound(corpus, vecCol, cents)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .toMap
      cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }
    cents
  }

  /** One spherical-k-means round: row-local baked-argmax assignment (the
    * codebook is k×dim literals inside a `greatest()` over candidate
    * structs — the e15 pattern: no join, NO shuffle of corpus rows)
    * followed by the per-(cell, pos) mean aggregate, whose exchange moves
    * only k×dim partial means. The struct compares cosine first, then
    * -cell_id, replicating the old window's (cos DESC, cell ASC)
    * tie-break exactly. Returns (cell_id, centroid) for cells with ≥1
    * member. */
  private[graft] def kmeansRound(
      corpus: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    // the codebook rides the expression as a REFERENCE OBJECT
    // (functions.NearestCellF32) — one helper-call per row, so the
    // generated method stays JIT-compiled at any k×dim, where an unrolled
    // per-candidate expression tree exceeded HotSpot's ~8 KB huge-method
    // limit and ran interpreted (measured 5× slower)
    val sorted = cents.sortBy(_._1)
    val idx = org.apache.spark.sql.GraftPlanBridge.ofExpr(
      graft.functions.NearestCellF32(
        org.apache.spark.sql.GraftPlanBridge.exprOf(col(vecCol)),
        sorted.map(_._2).toArray))
    val ids = typedLit(sorted.map(_._1))
    corpus
      .select(element_at(ids, idx + 1).as("cell_id"), posexplode(col(vecCol)))
      .groupBy(col("cell_id"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy(col("cell_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).cast("array<float>").as("centroid"))
  }

  /** Rebuild the broadcastable (cell_id, centroid) frame from a
    * driver-held codebook. */
  def centroidsDF(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cell_id", "centroid")
  }

  /** Row-local nearest-cell assignment over a driver-held codebook — the
    * training-round kernel ([[kmeansRound]]) reused on the SERVING side:
    * the codebook rides the expression as a reference object
    * ([[graft.functions.NearestCellF32]]), so corpus cell assignment is a
    * narrow map over the scan — no corpus×k crossJoin expansion, no
    * per-row window shuffle. Appends `cell_id`; tie/zero-norm semantics
    * identical to sorting candidates by (cosine DESC NULLS LAST,
    * cell ASC). */
  private[operators] def withNearestCell(
      df: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Float])]): DataFrame = {
    val sorted = cents.sortBy(_._1)
    val idx = org.apache.spark.sql.GraftPlanBridge.ofExpr(
      graft.functions.NearestCellF32(
        org.apache.spark.sql.GraftPlanBridge.exprOf(col(vecCol)),
        sorted.map(_._2).toArray))
    df.withColumn("cell_id", element_at(typedLit(sorted.map(_._1)), idx + 1))
  }

  /** Public serving-side cell assignment — [[withNearestCell]] exposed
    * for composition (cluster-balanced sampling, cell audits): appends
    * `cell_id` via the row-local reference-object kernel, no shuffle. */
  def assignCells(
      corpus: DataFrame, vecCol: String,
      cents: Seq[(Long, Array[Float])]): DataFrame =
    withNearestCell(corpus, vecCol, cents)

  /** Cluster-balanced subsampling — the "cluster then cap" diversity
    * selection stage (the DataComp/SemDeDup-family move: k-means the
    * embedding space, cap each cell's contribution so dense
    * near-duplicate regions cannot dominate the sample; the quota
    * complement of [[graft.operators.Dedup.semDedupPairs]]' removal
    * path). Assignment is the row-local [[assignCells]] kernel over the
    * driver-held codebook; within each cell the deterministic
    * (md5(id), id) hash-priority order keeps the first `perCellCap` rows
    * ([[graft.operators.Sampling.quotaSample]]'s contract — reproducible
    * across runs, engines, and partitionings).
    *
    * Scale shape: one narrow assignment pass (no corpus×k expansion),
    * then quotaSample's WindowGroupLimit — per-partition top-cap heaps
    * before the one cell-keyed shuffle. Output = input columns +
    * `cell_id` + `sample_rank`. */
  def clusterBalancedSample(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Array[Float])], perCellCap: Int): DataFrame = {
    require(perCellCap > 0)
    graft.operators.Sampling.quotaSample(
      assignCells(corpus, vecCol, cents), idCol, "cell_id", perCellCap)
  }

  /** Driver-held form of a (cell_id, centroid) frame (k rows — bounded by
    * construction; the codebook IS a driver-sized artifact, see
    * [[kmeansCentroidsCollected]]). */
  private[operators] def collectCents(cents: DataFrame): Seq[(Long, Array[Float])] =
    cents.select(col("cell_id").cast("long").as("cell_id"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  /** IVF ANN over explicit centroids: assign each corpus vector to its
    * nearest centroid, have each probe scan the `nProbe` nearest cells.
    * The cell assignment is computed once and is bucketable/persistable.
    * The corpus side — the data-proportional one — assigns ROW-LOCALLY
    * ([[withNearestCell]]); only the small probe set still windows for
    * its nProbe nearest cells. */
  def ivfTopKWith(
      cents: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    ivfTopKFromIndex(ivfBuildIndex(corpus, idCol, vecCol, cents),
      cents, probes, idCol, vecCol, k, nProbe)

  /** IVF recall-vs-nProbe OPERATING CURVE — the tuning table an engineer
    * reads to pick nProbe (every ANN deployment publishes one: recall@k
    * against probe budget). One [[ivfBuildIndex]] over the frozen
    * quantizer, then recall@k of [[ivfTopKFromIndex]] vs
    * [[bruteForceTopK]] at each setting.
    *
    * Two properties make the curve GATEABLE, not just reportable:
    * (1) overlap@k is provably monotone in nProbe — the candidate set
    * grows with probed cells, and under the global (cosine DESC, id ASC)
    * total order the top-k of a superset can only displace an
    * exact-top-k member with a higher-ranked element, which is itself
    * exact-top-k; (2) at nProbe = |cells| the probe is exhaustive, so
    * the shortlist is the whole corpus and recall is exactly 1.
    *
    * Callers pass a non-empty probe set: with zero probes every recall
    * denominator is an empty count and the settings report null recall
    * (a visible signal, not a crash). */
  def ivfRecallCurve(
      cents: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Seq[Int]): DataFrame = {
    require(nProbes.nonEmpty)
    // both the index and the brute-force baseline are shared by every
    // nProbe setting's subtree — materialize each ONCE instead of
    // re-deriving them |nProbes| times in the unioned plan; the two
    // materializations are independent, so they run CONCURRENTLY
    // (r21, guide §2.6)
    val (index, bf) = Par.join2(
      ivfBuildIndex(corpus, idCol, vecCol, cents)
        .localCheckpoint(true),
      bruteForceTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
        .localCheckpoint(true))
    try {
      nProbes.map { np =>
        val ivf = ivfTopKFromIndex(index, cents, probes, idCol, vecCol, k, np)
          .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_ivf"))
        ivf.join(bf, Seq("probe_id", "neighbor_id"), "full_outer")
          .agg((count(when(col("in_ivf") === 1 && col("in_bf") === 1, 1))
            .cast("double") / count(col("in_bf"))).as("recall"))
          .select(lit(np).as("n_probe"), col("recall"))
      }.reduce(_ unionAll _)
        .localCheckpoint(true) // |nProbes| rows; free the shared blocks
    } finally { Dedup.release(index); Dedup.release(bf) }
  }

  /** Per-setting recall@k of a shortlist→exact-re-rank tier against a
    * checkpointed brute-force baseline — the shared body of
    * [[jlRecallCurve]]/[[pqShortlistRecallCurve]]. `bf` must carry
    * (probe_id, neighbor_id, in_bf=1). */
  private def recallAt(
      tier: Int => DataFrame, bf: DataFrame,
      shortlists: Seq[Int]): DataFrame =
    shortlists.map { sl =>
      tier(sl)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_t"))
        .join(bf, Seq("probe_id", "neighbor_id"), "full_outer")
        .agg((count(when(col("in_t") === 1 && col("in_bf") === 1, 1))
          .cast("double") / count(col("in_bf"))).as("recall"))
        .select(lit(sl).as("shortlist"), col("recall"))
    }.reduce(_ unionAll _)

  /** JL-tier OPERATING CURVE — recall@k vs shortlist size, the tuning
    * table for the e17 two-stage tier (how many tier-1 candidates must
    * pay the full-width re-rank for a target recall). Gated on the same
    * two PROVABLE properties as [[ivfRecallCurve]]: (1) a larger
    * shortlist is a SUPERSET of a smaller one (the tier-1 ADC/JL ranking
    * is fixed, so top-s₁ ⊆ top-s₂ for s₁ ≤ s₂), and under the exact
    * re-rank's global (cosine DESC, id ASC) order the top-k of a superset
    * can only displace an exact-top-k member with a higher-ranked
    * element — overlap@k is monotone; (2) shortlist ≥ |corpus| admits
    * every candidate, the re-rank IS the exact ranking, recall exactly 1.
    * Index and baseline are built ONCE (checkpointed) and shared by all
    * settings. */
  def jlRecallCurve(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, shortlists: Seq[Int],
      sourceDim: Int = 64, targetDim: Int = 16,
      prebuiltIndex: Option[DataFrame] = None): DataFrame = {
    require(shortlists.nonEmpty)
    // index and baseline are independent — materialize concurrently
    // (r21, guide §2.6)
    val (index, bf) = Par.join2(
      prebuiltIndex
        .getOrElse(jlBuildIndex(corpus, idCol, vecCol, sourceDim, targetDim))
        .localCheckpoint(true),
      bruteForceTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
        .localCheckpoint(true))
    try {
      recallAt(sl => jlTopKFromIndex(index, corpus, probes, idCol, vecCol,
          k, sl, sourceDim, targetDim), bf, shortlists)
        .localCheckpoint(true)
    } finally { Dedup.release(index); Dedup.release(bf) }
  }

  /** PQ-tier OPERATING CURVE — recall@k vs ADC shortlist size over ONE
    * trained codebook and code table (the e08 tier's tunable serving
    * knob). Same provable gates as [[jlRecallCurve]]: the ADC ranking is
    * fixed given the codebook, so shortlists nest, overlap@k is monotone,
    * and an all-corpus shortlist re-ranks exhaustively — recall exactly 1
    * REGARDLESS of codebook quality. The baseline ranks the same
    * L2-normalized vectors the tier re-ranks (normalization rounding
    * cancels, so the exhaustive point is bit-exact). Codebook, codes,
    * normalized sides, and baseline are each built once (checkpointed)
    * and shared across settings. */
  def pqShortlistRecallCurve(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, shortlists: Seq[Int],
      m: Int = 8, ksub: Int = 32, iters: Int = 2,
      seed: Long = 42L,
      pretrained: Option[Seq[(Int, Int, Array[Float])]] = None): DataFrame = {
    require(shortlists.nonEmpty)
    // the two normalized sides are independent — materialize concurrently,
    // then overlap the baseline with the codebook-train + encode chain
    // (r21, guide §2.6; each job is unchanged, only submission overlaps)
    val (c, p) = Par.join2(
      corpus.select(col(idCol).as("neighbor_id"),
        l2normalize(col(vecCol)).as("__nv")).localCheckpoint(true),
      probes.select(col(idCol).as("probe_id"),
        l2normalize(col(vecCol)).as("__pv")).localCheckpoint(true))
    try {
      // train ONCE to a driver-held codebook (m×ksub×subdim floats) so the
      // per-setting plans bake a literal codebook instead of re-running
      // the k-means subtree |shortlists| times; an offline-trained
      // codebook (the e08 memoized tier) passes through untouched
      val (bf, (cents, codes)) = Par.join2(
        bruteForceTopK(
            c.select(col("neighbor_id").as(idCol), col("__nv").as(vecCol)),
            p.select(col("probe_id").as(idCol), col("__pv").as(vecCol)),
            idCol, vecCol, k)
          .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_bf"))
          .localCheckpoint(true),
        {
          val ce = pqCodebookDF(corpus.sparkSession, pretrained.getOrElse(
            pqTrainCollected(c, "neighbor_id", "__nv", m, ksub, iters, seed)))
          (ce, pqEncode(ce, c, "neighbor_id", "__nv", m)
            .localCheckpoint(true))
        })
      try {
        recallAt(sl => pqTopKFromIndexNormalized(cents, codes, c, p, k, m, sl),
            bf, shortlists)
          .localCheckpoint(true)
      } finally { Dedup.release(codes); Dedup.release(bf) }
    } finally { Dedup.release(c); Dedup.release(p) }
  }

  /** Build the IVF serving index over a FROZEN quantizer: each corpus
    * vector's row-local nearest-cell assignment plus the vector itself —
    * `(neighbor_id, cv, cell_id)`, the persistable cell-partitioned
    * artifact [[ivfTopKFromIndex]] serves from. Assignment depends only
    * on the row and the codebook, so a delta's index rows are
    * bit-identical to what a full rebuild computes for them — the fact
    * [[ivfExtendIndex]]'s append rides on. */
  def ivfBuildIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    withNearestCell(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "cv", collectCents(cents))

  /** Incrementally maintain a persisted [[ivfBuildIndex]] table under
    * exactly-once versioned commits — the ANN-index half of a streaming
    * ingest pipeline, with the quantizer FROZEN (trained offline once;
    * re-training would re-assign every existing row, which is a rebuild,
    * not a refresh — the standard IVF production economics). Each batch
    * assigns ONLY its own rows row-locally and lands as a new immutable
    * segment under the same monotone-id guard as [[jlExtendIndex]]; a
    * replayed batchId is a no-op, and after any batching the committed
    * index EQUALS a full rebuild (the e20 gate proves it row-for-row).
    * At scale the refresh is O(delta assign) — no prior index byte is
    * read or rewritten; the versioned manifest buys atomic
    * serve-while-refresh between commits. */
  def ivfExtendIndex(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      delta: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, batchId: Long): Unit =
    graft.operators.IncrementalAgg.appendOnce(spark, statePath,
      ivfBuildIndex(delta, idCol, vecCol, cents), batchId,
      guardIdCol = "neighbor_id")

  /** [[ivfTopKWith]] served from a prebuilt (persisted) [[ivfBuildIndex]]
    * table: probes window for their `nProbe` nearest cells against the
    * broadcast codebook, the index joins on `cell_id` (partition-pruned
    * when the index is written partitioned by cell), and only cell
    * members pay the exact cosine re-rank. */
  def ivfTopKFromIndex(
      index: DataFrame, cents: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    def nearestCells(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(
        col("cell_cos").desc, col("cell_id").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("cell_cos", cosineF32(col(vec), col("centroid")))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= n)
        .drop("centroid", "cell_cos", "cell_rank")
    }
    val p = nearestCells(
      probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv")),
      "probe_id", "pv", nProbe)
    val scored = index.join(broadcast(p), "cell_id")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("pv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN with the deterministic lowest-id centroid stand-in —
    * fully SQL-replicable, which is what makes the e05 oracle hash-exact.
    * [[ivfTopKKMeans]] is the trained-quantizer variant. */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    ivfTopKWith(cents, corpus, probes, idCol, vecCol, k, nProbe)
  }

  /** IVF ANN over a seeded-k-means quantizer ([[kmeansCentroids]]) — the
    * production form: trained cells give a tighter candidate set at the
    * same nProbe than the lowest-id stand-in. Float means keep the last
    * bit of the centroids engine-specific, so its oracle is the
    * recall-gate row (e06), not a SQL replica. */
  def ivfTopKKMeans(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 3,
      seed: Long = 42L): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, nCells, iters, seed)
    ivfTopKWith(cents, corpus, probes, idCol, vecCol, k, nProbe)
  }

  /** L2-normalized copy of a vector column (zero vectors pass through).
    * Normalizing once up front makes L2 ranking ≡ cosine ranking, which is
    * what lets [[pqTopK]] use standard L2 product quantization to answer
    * cosine top-k. */
  private def l2normalize(vec: Column): Column = {
    val n = l2normF32(vec)
    when(n > 0, transform(vec, x => (x / n).cast("float"))).otherwise(vec)
  }

  /** Train a product quantizer: split each vector into `m` contiguous
    * subvectors and run seeded k-means with `ksub` centroids independently
    * in every subspace. Output: (sub_id, code, centroid) — m×ksub rows.
    *
    * All m subspaces train in ONE set of jobs: the corpus explodes once
    * into an (id, sub_id, subvector) frame (persisted across rounds), the
    * assignment is ROW-LOCAL ([[pqRound]] — per-subspace baked argmin
    * behind a CASE on sub_id, so no join and no shuffle of corpus rows),
    * and the mean update aggregates (sub_id, code, pos) cells — the
    * round's only exchange. Centroids are collected to the driver between
    * rounds (m×ksub subvectors — the same driver-held shape as
    * [[kmeansCentroids]]), truncating lineage. Init picks the hash-lowest
    * `ksub` subvectors per subspace — deterministic for a fixed seed.
    * Distances use |c|² − 2·v·c (the |v|² term is constant per
    * (row, subspace) and cannot change the argmin). */
  def pqTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2, seed: Long = 42L): DataFrame =
    pqCodebookDF(corpus.sparkSession,
      pqTrainCollected(corpus, idCol, vecCol, m, ksub, iters, seed))

  /** Driver-held form of a trained PQ codebook (m×ksub subvectors) — the
    * offline-built index artifact; callers memoize it per corpus and pass
    * it back through [[pqTopK]]'s `pretrained` (see
    * [[kmeansCentroidsCollected]] for the rationale). */
  def pqTrainCollected(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2,
      seed: Long = 42L): Seq[(Int, Int, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sd = dim / m
    val sub = corpus.select(col(idCol).as("__vid"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col(vecCol), i * sd + 1, lit(sd)))))
      .toDF("__vid", "sub_id", "sv")
      .persist()
    try {
      val wInit = Window.partitionBy(col("sub_id"))
        .orderBy(xxhash64(col("__vid"), lit(seed)), col("__vid"))
      var cents: Seq[(Int, Int, Array[Float])] = sub
        .withColumn("__rn", row_number().over(wInit))
        .filter(col("__rn") <= ksub)
        .select(col("sub_id"), (col("__rn") - 1).cast("int").as("code"), col("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
        .toSeq
      for (_ <- 1 to iters) {
        val means = pqRound(sub, cents)
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
          .toMap
        cents = cents.map { case (s, c, old) =>
          (s, c, means.getOrElse((s, c), old)) }
      }
      cents
    } finally sub.unpersist()
  }

  /** One PQ training round over the exploded (sub_id, sv) frame:
    * per-subspace baked argmin behind a CASE on sub_id — only the matched
    * branch evaluates, so each row pays its own subspace's ksub sub-dim
    * distances (the same arithmetic the old broadcast join paid) with NO
    * shuffle of corpus rows; the only exchange aggregates (sub_id, code,
    * pos) partial means. `least()` on struct(d2, code) replicates the old
    * window's (d2 ASC, code ASC) tie-break; |c|² is a literal
    * subexpression Catalyst constant-folds. */
  /** Column computing the argmin PQ code for a ("sub_id", "sv") row over a
    * driver-held codebook — the reference-object kernel (see
    * [[kmeansRound]]): the m×ksub centroids and their precomputed |c|²
    * ride [[graft.functions.NearestPqCodeF32]], whose |c|² uses the same
    * sqrt-then-square double arithmetic as pow(l2normF32(c), 2) so
    * distances match the expression formulation bit-exactly. The kernel
    * emits the sorted-array INDEX as the code, so the codebook MUST be
    * contiguous — sub_ids 0..m−1 and codes 0..ksub−1 per subspace (true
    * by construction from [[pqTrainCollected]]'s init; validated here so
    * a gapped external codebook fails loudly instead of silently
    * mislabeling codes). */
  private def pqArgminCode(cents: Seq[(Int, Int, Array[Float])]): Column = {
    val bySub = cents.groupBy(_._1).toSeq.sortBy(_._1)
    bySub.zipWithIndex.foreach { case ((subId, entries), i) =>
      require(subId == i,
        s"PQ codebook sub_ids must be contiguous 0..${bySub.size - 1}; " +
          s"found $subId at position $i")
      val codes = entries.map(_._2).sorted
      require(codes == codes.indices.toSeq,
        s"PQ codebook codes for sub_id $subId must be contiguous " +
          s"0..${codes.size - 1}; found ${codes.take(8).mkString(",")}…")
    }
    val centArr: Array[Array[Array[Float]]] =
      bySub.map(_._2.sortBy(_._2).map(_._3).toArray).toArray
    val cSq: Array[Array[Double]] = centArr.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { val x = c(i).toDouble; acc += x * x; i += 1 }
      math.pow(math.sqrt(acc), 2)
    })
    org.apache.spark.sql.GraftPlanBridge.ofExpr(
      graft.functions.NearestPqCodeF32(
        org.apache.spark.sql.GraftPlanBridge.exprOf(col("sv")),
        org.apache.spark.sql.GraftPlanBridge.exprOf(col("sub_id")),
        cSq, centArr))
  }

  private[graft] def pqRound(
      sub: DataFrame, cents: Seq[(Int, Int, Array[Float])]): DataFrame = {
    sub
      .select(col("sub_id"), pqArgminCode(cents).as("code"),
        posexplode(col("sv")))
      .groupBy(col("sub_id"), col("code"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy(col("sub_id"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).cast("array<float>").as("centroid"))
  }

  /** Rebuild the broadcastable (sub_id, code, centroid) frame from a
    * driver-held PQ codebook. */
  def pqCodebookDF(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Int, Array[Float])]): DataFrame = {
    import spark.implicits._
    cents.toDF("sub_id", "code", "centroid")
  }

  /** Train a PQ codebook on the L2-NORMALIZED corpus — the exact frame
    * [[pqTopK]] trains on internally, so a memoized result of this is a
    * drop-in `pretrained` argument. */
  def pqTrainNormalizedCollected(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 32, iters: Int = 2,
      seed: Long = 42L): Seq[(Int, Int, Array[Float])] = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2normalize(col(vecCol)).as("__nv")).persist()
    try pqTrainCollected(c, "neighbor_id", "__nv", m, ksub, iters, seed)
    finally c.unpersist()
  }

  /** Encode each corpus vector against a trained codebook: nearest centroid
    * per subspace. Long form (id, sub_id, code) — m small ints per vector,
    * the persistable PQ index (64× smaller than the f32 vectors at
    * m=8/ksub≤256 over 64 dims). */
  def pqEncode(
      cents: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val sd = dim / m
    // row-local argmin over the driver-held codebook (pqArgminCode — the
    // training kernel reused at ENCODE time): the corpus-proportional
    // path never expands ×ksub or shuffles for assignment
    val held = cents
      .select(col("sub_id").cast("int"), col("code").cast("int"),
        col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray)).toSeq
    corpus.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col(vecCol), i * sd + 1, lit(sd)))))
      .toDF(idCol, "sub_id", "sv")
      .select(col(idCol), col("sub_id"), pqArgminCode(held).as("code"))
  }

  /** Product-quantization ANN with asymmetric-distance (ADC) shortlist +
    * exact re-rank: vectors L2-normalize (so L2 ≡ cosine order), a seeded
    * PQ codebook trains on the corpus, the corpus is stored as m codes per
    * vector, and each probe scores every corpus row by summing m
    * table-lookup distances — then the top `shortlist` candidates re-rank
    * with exact cosine and the top-k survive.
    *
    * Scale shape: the scored frame is codes ⋈ broadcast(distance tables) —
    * the full-precision corpus vectors are touched only for the
    * O(shortlist × probes) re-rank, which is the point of PQ at 100 TB:
    * the scan-everything stage reads the compact code index, not the
    * vectors. The per-probe distance table is m×ksub doubles, broadcast
    * with the probe id. Float means keep the codebook engine-specific, so
    * its gate is the e08 recall row, not a SQL replica. */
  def pqTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 32, shortlist: Int = 256,
      iters: Int = 2, seed: Long = 42L,
      pretrained: Option[Seq[(Int, Int, Array[Float])]] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2normalize(col(vecCol)).as("__nv")).persist()
    try {
      val cents = pretrained
        .map(pqCodebookDF(corpus.sparkSession, _))
        .getOrElse(pqTrain(c, "neighbor_id", "__nv", m, ksub, iters, seed))
      val codes = pqEncode(cents, c, "neighbor_id", "__nv", m)
      // reuse the persisted normalized frame for the re-rank instead of
      // letting pqTopKFromIndex re-scan and re-normalize the raw corpus
      pqTopKFromIndexNormalized(cents, codes, c,
        probes.select(col(idCol).as("probe_id"),
          l2normalize(col(vecCol)).as("__pv")),
        k, m, shortlist).localCheckpoint(true)
    } finally c.unpersist()
  }

  /** [[pqEncode]] over the L2-normalized corpus — the code table a PQ
    * system persists as its index (pairs with
    * [[pqTrainNormalizedCollected]]'s codebook). Output columns:
    * (neighbor_id, sub_id, code). */
  def pqEncodeNormalized(
      cents: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int = 8): DataFrame =
    pqEncode(cents,
      corpus.select(col(idCol).as("neighbor_id"),
        l2normalize(col(vecCol)).as("__nv")),
      "neighbor_id", "__nv", m)

  /** Per-probe ADC lookup array: the (probe, sub, code) distance table
    * folded to ONE ordered array of m·ksub doubles per probe — entry
    * sub·ksub + code. A few KB per probe; broadcast by the callers. */
  private def packedDtArr(
      cents: DataFrame, p: DataFrame, m: Int, sd: Int, ksub: Int): DataFrame =
    p.select(col("probe_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("__pv"), i * sd + 1, lit(sd)))))
      .toDF("probe_id", "sub_id", "psv")
      .join(broadcast(cents), "sub_id")
      .select(col("probe_id"),
        (col("sub_id") * ksub + col("code")).as("__idx"),
        (pow(l2normF32(col("centroid")), 2) -
          lit(2.0) * dotF32(col("psv"), col("centroid"))).as("pd"))
      .groupBy(col("probe_id"))
      .agg(transform(array_sort(collect_list(struct(col("__idx"), col("pd")))),
        s => s.getField("pd")).as("__dt"))

  /** Shared serving tail for the packed-codes ADC paths: candidates
    * carrying (probe_id, neighbor_id, codes, __dt) get their ADC distance
    * from an in-row m-step lookup fold (no shuffle), shortlist per probe,
    * then exact-cosine re-rank. */
  private def servePackedCandidates(
      c: DataFrame, p: DataFrame, cands: DataFrame,
      k: Int, m: Int, ksub: Int, shortlist: Int): DataFrame = {
    val wS = Window.partitionBy(col("probe_id"))
      .orderBy(col("__ad").asc, col("neighbor_id").asc)
    val short = cands
      .withColumn("__ad",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, i) => acc + element_at(col("__dt"),
            i * ksub + element_at(col("codes"), i + 1) + 1)))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("__rn", row_number().over(wS))
      .filter(col("__rn") <= shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short.join(c, "neighbor_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("__pv"), col("__nv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[pqEncodeNormalized]] re-shaped to ONE row per vector
    * (neighbor_id, codes array<int>) — the layout that lets the ADC scan
    * run shuffle-free (see [[ivfPqBuildIndexPacked]]). */
  def pqEncodePackedNormalized(
      cents: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int = 8): DataFrame =
    pqEncodeNormalized(cents, corpus, idCol, vecCol, m)
      .groupBy(col("neighbor_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** PQ-only serving over PACKED codes: every vector is an ADC candidate
    * (no coarse stage), but the distance evaluation is the same per-row
    * m-step lookup fold as [[ivfPqTopKFromPackedIndex]] — candidates × 1
    * narrow rows instead of the exploded layout's candidates × m × probes
    * rows shuffled into a (probe, neighbor) aggregate. */
  def pqTopKFromPackedCodes(
      cents: DataFrame, packed: DataFrame,
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, shortlist: Int = 256): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2normalize(col(vecCol)).as("__nv"))
    val p = probes.select(col(idCol).as("probe_id"),
      l2normalize(col(vecCol)).as("__pv"))
    val sd = c.select(size(col("__nv"))).head.getInt(0) / m
    val ksub = cents.agg(max(col("code"))).head.getInt(0) + 1
    val dtArr = packedDtArr(cents, p, m, sd, ksub)
    servePackedCandidates(c, p, packed.crossJoin(broadcast(dtArr)),
      k, m, ksub, shortlist)
  }

  /** PQ ANN query over a PREBUILT index — `cents` the codebook frame,
    * `codes` the (neighbor_id, sub_id, code) table ([[pqEncodeNormalized]]
    * output, typically read back from parquet): ADC shortlist from the
    * code table, exact cosine re-rank against the full-precision vectors.
    * This is the 100 TB serving shape — the scan-everything stage touches
    * the compact code index; the corpus vectors are only read for the
    * O(shortlist × probes) re-rank. */
  def pqTopKFromIndex(
      cents: DataFrame, codes: DataFrame,
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, shortlist: Int = 256): DataFrame =
    pqTopKFromIndexNormalized(cents, codes,
      corpus.select(col(idCol).as("neighbor_id"),
        l2normalize(col(vecCol)).as("__nv")),
      probes.select(col(idCol).as("probe_id"),
        l2normalize(col(vecCol)).as("__pv")),
      k, m, shortlist)

  /** Build the IVF-PQ index table: each corpus vector's nearest coarse
    * cell (cosine — scale-invariant, so raw vectors assign identically to
    * normalized ones) zipped with its PQ codes against the global
    * codebook. Output (neighbor_id, cell_id, sub_id, code) — m+1 small
    * ints per vector, the persistable artifact. Written
    * `partitionBy("cell_id")`, a probe's nProbe/nCells fraction of the
    * table is reachable by partition pruning. */
  def ivfPqBuildIndex(
      coarse: DataFrame, cents: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int = 8): DataFrame = {
    // coarse assignment is row-local (withNearestCell) — the build's only
    // shuffles are pqEncode's own
    val assign = withNearestCell(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
      "__v", collectCents(coarse))
      .select(col("neighbor_id"), col("cell_id"))
    pqEncodeNormalized(cents, corpus, idCol, vecCol, m)
      .join(assign, "neighbor_id")
  }

  /** [[ivfPqBuildIndex]] with PACKED codes — (neighbor_id, cell_id,
    * codes array<int>), ONE row per vector instead of m. Same information,
    * but the packed shape is what lets the ADC scan stay shuffle-free
    * ([[ivfPqTopKFromPackedIndex]]): the exploded layout forces a
    * candidates×m explode + groupBy to sum partial distances, and that
    * shuffle IS the serving cost at corpus scale. Packing costs one extra
    * aggregate at BUILD time — offline, amortized over every query. */
  def ivfPqBuildIndexPacked(
      coarse: DataFrame, cents: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int = 8): DataFrame =
    ivfPqBuildIndex(coarse, cents, corpus, idCol, vecCol, m)
      .groupBy(col("neighbor_id"), col("cell_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** IVFADC over the PACKED index with NO shuffle between the pruned
    * code-table scan and the shortlist: the per-(probe, sub, code)
    * distance table folds into one ordered lookup array per probe
    * (m·ksub doubles — a few KB, broadcast), and each candidate row
    * computes its ADC distance with an m-step in-row fold of
    * `dt[sub·ksub + code]` lookups. The exploded-layout variant
    * ([[ivfPqTopKFromIndex]]) shuffles candidates×m rows into a
    * (probe, neighbor) aggregate — 24M rows at sf0.1 — which this shape
    * replaces with a narrow map stage; only the per-probe shortlist
    * window still exchanges rows. Same coarse pruning (broadcast
    * (probe, cell) pairs → dynamic partition pruning on the
    * cell_id-partitioned index) and the same exact-cosine re-rank. */
  def ivfPqTopKFromPackedIndex(
      coarse: DataFrame, cents: DataFrame, index: DataFrame,
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, nProbe: Int = 4, shortlist: Int = 128): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2normalize(col(vecCol)).as("__nv"))
    val p = probes.select(col(idCol).as("probe_id"),
      l2normalize(col(vecCol)).as("__pv"))
    val wC = Window.partitionBy(col("probe_id"))
      .orderBy(col("__ccos").desc, col("cell_id").asc)
    val pcells = p.crossJoin(broadcast(coarse))
      .withColumn("__ccos", cosineF32(col("__pv"), col("centroid")))
      .withColumn("__rn", row_number().over(wC))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("cell_id"))
    val sd = c.select(size(col("__nv"))).head.getInt(0) / m
    val ksub = cents.agg(max(col("code"))).head.getInt(0) + 1
    val dtArr = packedDtArr(cents, p, m, sd, ksub)
    servePackedCandidates(c, p,
      index.join(broadcast(pcells), "cell_id")
        .join(broadcast(dtArr), "probe_id"),
      k, m, ksub, shortlist)
  }

  /** IVF-PQ ANN over a PREBUILT index — the production serving shape that
    * composes the coarse quantizer (e06) with product quantization (e08):
    * a probe ranks the coarse cells, and the ADC scan touches only the
    * probed cells' rows of the code table instead of every code (IVFADC,
    * Jégou/Douze/Schmid TPAMI 2011; global codebook, no residual
    * re-encode). Shortlist re-ranks with exact cosine.
    *
    * Scale shape: (probe, cell) pairs and per-probe distance tables both
    * broadcast; the only big-table scan is the code-table join, reduced to
    * the probed nProbe/nCells fraction (via partition pruning when `index`
    * is parquet partitioned by cell_id); the full-precision vectors are
    * touched for O(shortlist × probes) rows only. */
  def ivfPqTopKFromIndex(
      coarse: DataFrame, cents: DataFrame, index: DataFrame,
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, nProbe: Int = 4, shortlist: Int = 128): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2normalize(col(vecCol)).as("__nv"))
    val p = probes.select(col(idCol).as("probe_id"),
      l2normalize(col(vecCol)).as("__pv"))
    val wC = Window.partitionBy(col("probe_id"))
      .orderBy(col("__ccos").desc, col("cell_id").asc)
    val pcells = p.crossJoin(broadcast(coarse))
      .withColumn("__ccos", cosineF32(col("__pv"), col("centroid")))
      .withColumn("__rn", row_number().over(wC))
      .filter(col("__rn") <= nProbe)
      .select(col("probe_id"), col("cell_id"))
    val sd = c.select(size(col("__nv"))).head.getInt(0) / m
    val dt = p.select(col("probe_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("__pv"), i * sd + 1, lit(sd)))))
      .toDF("probe_id", "sub_id", "psv")
      .join(broadcast(cents), "sub_id")
      .select(col("probe_id"), col("sub_id"), col("code"),
        (pow(l2normF32(col("centroid")), 2) -
          lit(2.0) * dotF32(col("psv"), col("centroid"))).as("pd"))
    val wS = Window.partitionBy(col("probe_id"))
      .orderBy(col("__ad").asc, col("neighbor_id").asc)
    val short = index
      .join(broadcast(pcells), "cell_id")
      .join(broadcast(dt), Seq("probe_id", "sub_id", "code"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(sum(col("pd")).as("__ad"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("__rn", row_number().over(wS))
      .filter(col("__rn") <= shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short.join(c, "neighbor_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("__pv"), col("__nv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[pqTopKFromIndex]] over already-normalized frames — `c` with
    * (neighbor_id, __nv), `p` with (probe_id, __pv) — so a caller holding
    * a persisted normalized corpus (pqTopK's training path) doesn't pay a
    * second scan + normalization. */
  private def pqTopKFromIndexNormalized(
      cents: DataFrame, codes: DataFrame,
      c: DataFrame, p: DataFrame, k: Int,
      m: Int, shortlist: Int): DataFrame = {
    val sd = c.select(size(col("__nv"))).head.getInt(0) / m
    val dt = p.select(col("probe_id"),
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            i => slice(col("__pv"), i * sd + 1, lit(sd)))))
        .toDF("probe_id", "sub_id", "psv")
        .join(broadcast(cents), "sub_id")
        .select(col("probe_id"), col("sub_id"), col("code"),
          (pow(l2normF32(col("centroid")), 2) -
            lit(2.0) * dotF32(col("psv"), col("centroid"))).as("pd"))
      val wS = Window.partitionBy(col("probe_id"))
        .orderBy(col("__ad").asc, col("neighbor_id").asc)
      val short = codes
        .join(broadcast(dt), Seq("sub_id", "code"))
        .groupBy(col("probe_id"), col("neighbor_id"))
        .agg(sum(col("pd")).as("__ad"))
        .filter(col("probe_id") =!= col("neighbor_id"))
        .withColumn("__rn", row_number().over(wS))
        .filter(col("__rn") <= shortlist)
        .select(col("probe_id"), col("neighbor_id"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      short.join(c, "neighbor_id")
        .join(broadcast(p), "probe_id")
        .select(col("probe_id"), col("neighbor_id"),
          cosineF32(col("__pv"), col("__nv")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
  }

  /** Two-tier kNN served from the JL-reduced table
    * ([[Quantize.randomProjectionVec]], e16): the SHORTLIST ranks on the
    * 4×-narrower reduced vectors — one reduced-corpus scan against
    * broadcast reduced probes — and only shortlist rows touch the full
    * vectors for exact cosine re-ranking. At 100 TB this is the
    * bytes-scanned lever: the first tier reads k doubles per row instead
    * of d, and the full-width read is `shortlist × probes` rows, not the
    * corpus. Recall degrades with JL distortion (O(√(log n / k))) — e17
    * MEASURES it against the exact ranking rather than assuming it. Plan
    * shape matches [[bruteForceTopK]]/[[int8TopK]]: broadcast probes, one
    * corpus scan per tier, WindowGroupLimit heaps. */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, e) => acc + e)

  /** Build the JL tier-1 serving index: each corpus vector's reduced
    * projection plus its norm (computed ONCE here, so the pair loop pays
    * one dot product, not three) — the persistable artifact
    * [[jlTopKFromIndex]] serves from. At 100 TB this table is what the
    * shortlist scan reads: targetDim/sourceDim of the full-width bytes,
    * built offline exactly like the e08/e10 code tables. */
  def jlBuildIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      sourceDim: Int = 64, targetDim: Int = 16): DataFrame =
    Quantize.randomProjectionVec(corpus, idCol, vecCol, sourceDim, targetDim)
      .select(col(idCol).as("neighbor_id"), col("rvec"),
        sqrt(dotD(col("rvec"), col("rvec"))).as("rnorm"))

  /** Incrementally maintain a persisted [[jlBuildIndex]] table under
    * [[IncrementalAgg.appendOnce]]'s exactly-once versioned commits:
    * each batch encodes ONLY its own rows (the projection is row-local, so
    * a delta's index rows are bit-identical to what a full rebuild would
    * compute for them) and lands as a NEW immutable segment — vector ids
    * are append-only (the monotone-id guard raises on overlap), so no
    * prior index byte is ever read or rewritten: the commit is O(delta),
    * flat as the committed state grows. A replayed batchId is a no-op;
    * after any batching the committed index EQUALS [[jlBuildIndex]] over
    * everything ingested (the e18 gate proves it row-for-row). The
    * versioned manifest buys atomic serve-while-refresh, which is what
    * [[jlTopKFromIndex]] needs to keep serving between commits. */
  def jlExtendIndex(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      delta: DataFrame, idCol: String, vecCol: String, batchId: Long,
      sourceDim: Int = 64, targetDim: Int = 16): Unit =
    graft.operators.IncrementalAgg.appendOnce(spark, statePath,
      jlBuildIndex(delta, idCol, vecCol, sourceDim, targetDim), batchId,
      guardIdCol = "neighbor_id")

  def jlTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, shortlist: Int,
      sourceDim: Int = 64, targetDim: Int = 16): DataFrame =
    jlTopKFromIndex(jlBuildIndex(corpus, idCol, vecCol, sourceDim, targetDim),
      corpus, probes, idCol, vecCol, k, shortlist, sourceDim, targetDim)

  /** [[jlTopK]] served from a prebuilt (persisted) [[jlBuildIndex]] table:
    * the shortlist ranks on the index alone (one narrow index scan against
    * broadcast reduced probes); only shortlist rows touch the full-width
    * corpus for the exact re-rank. */
  def jlTopKFromIndex(
      index: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      sourceDim: Int = 64, targetDim: Int = 16): DataFrame = {
    val red = index.select(col("neighbor_id"), col("rvec").as("__rc"),
      col("rnorm").as("__rcn"))
    val pRed = Quantize.randomProjectionVec(
        probes, idCol, vecCol, sourceDim, targetDim)
      .select(col(idCol).as("probe_id"), col("rvec").as("__rp"),
        sqrt(dotD(col("rvec"), col("rvec"))).as("__rpn"))
    val wS = Window.partitionBy(col("probe_id"))
      .orderBy(col("__rcos").desc, col("neighbor_id").asc)
    // zero (or zero-projecting) vectors would divide to NaN, which
    // Spark's descending sort orders ABOVE all real cosines — null them
    // out instead so they sort last and never seize shortlist slots
    val short = red.crossJoin(broadcast(pRed))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        when(col("__rpn") * col("__rcn") > 0,
          dotD(col("__rp"), col("__rc")) / (col("__rpn") * col("__rcn")))
          .as("__rcos"))
      .withColumn("__rn", row_number().over(wS))
      .filter(col("__rn") <= shortlist)
      .select("probe_id", "neighbor_id")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short.join(c, "neighbor_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        cosineF32(col("__pv"), col("__nv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    * 1998) — retrieval that trades relevance against redundancy: after
    * the most-relevant pick, each further slot goes to
    * `argmax λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s)`, so a probe
    * surrounded by a clique of near-identical neighbors gets k DISTINCT
    * results instead of k copies (the hard-negative/dedup-aware serving
    * mode of retrieval pipelines).
    *
    * Distributed shape: one [[bruteForceTopK]]-style scan builds each
    * probe's `poolSize` candidate pool (probes broadcast, WindowGroupLimit
    * trim), then the k−1 greedy steps are UNROLLED as bounded per-probe
    * joins — step i joins ≤poolSize candidates against ≤i selected rows
    * per probe, all keyed by probe_id. No driver loop, no corpus
    * self-join; everything after the pool scan is pool-sized.
    *
    * Determinism: BOTH cosine kinds (probe-candidate relevance and
    * candidate-candidate similarity) are floor-quantized (the e01
    * recipe) BEFORE the score arithmetic, and λ defaults to 0.5 so the
    * blend is two exact halvings — scores and therefore picks replicate
    * bit-for-bit in any engine; ties break by neighbor_id.
    * Output: (probe_id, mmr_rank, neighbor_id, rel, mmr_score) — for
    * rank 1 `mmr_score = rel` (no diversity term yet). */
  def mmrTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, poolSize: Int, lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && poolSize >= k, "need poolSize >= k >= 1")
    def q(c: Column): Column = floor(c * 10000) / 10000
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val wPool = Window.partitionBy(col("probe_id"))
      .orderBy(col("rel").desc, col("neighbor_id").asc)
    // the pool (corpus scan × broadcast probes × window) is referenced by
    // EVERY greedy step's plan plus the seed row — materialize it ONCE so
    // the final plan pays one corpus scan, not k (pool is poolSize rows
    // per probe, the smallest thing in this operator)
    val pool = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("cv"),
        q(cosineF32(col("pv"), col("cv"))).as("rel"))
      .withColumn("__rn", row_number().over(wPool))
      .filter(col("__rn") <= poolSize)
      .localCheckpoint(true)
    try {
    var all = pool.filter(col("__rn") === 1).drop("__rn")
      .select(col("probe_id"), col("neighbor_id"), col("cv"), col("rel"),
        lit(1).as("mmr_rank"), col("rel").as("mmr_score"))
    for (step <- 2 to k) {
      val rem = pool.drop("__rn")
        .join(all.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id"), "left_anti")
      val wPick = Window.partitionBy(col("probe_id"))
        .orderBy(col("mmr_score").desc, col("neighbor_id").asc)
      val next = rem
        .join(all.select(col("probe_id"), col("cv").as("__sv")),
          Seq("probe_id"))
        .select(col("probe_id"), col("neighbor_id"), col("cv"), col("rel"),
          q(cosineF32(col("cv"), col("__sv"))).as("__simsel"))
        .groupBy(col("probe_id"), col("neighbor_id"))
        .agg(first(col("cv")).as("cv"), first(col("rel")).as("rel"),
          max(col("__simsel")).as("__maxsim"))
        .withColumn("mmr_score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("__maxsim"))
        .withColumn("__rk", row_number().over(wPick))
        .filter(col("__rk") === 1)
        .select(col("probe_id"), col("neighbor_id"), col("cv"), col("rel"),
          lit(step).as("mmr_rank"), col("mmr_score"))
      all = all.unionByName(next)
    }
    // materialize the (probes × k)-row result before releasing the pool
    // blocks it is built from
    all.select(col("probe_id"), col("mmr_rank"), col("neighbor_id"),
      col("rel"), col("mmr_score"))
      .localCheckpoint(true)
    } finally Dedup.release(pool)
  }

  /** CHUNK-level retrieval — the RAG serving stack end-to-end: documents
    * split into fixed-token windows ([[Packing.chunkTokens]] — retrieval
    * granularity finer than documents, the standard RAG prep), each chunk
    * and each query embedded via the signed hashed bag-of-words kernel
    * ([[Multimodal.hashedBowOf]] — the documented stand-in whose INTEGER
    * vectors make dot/norms exact in any engine; a real deployment swaps
    * only the embedding for model outputs), and each query's top-k chunks
    * returned by floor-quantized cosine. Output: (query_id, rank, doc_id,
    * chunk_id, cos_q).
    *
    * Scale shape: [[bruteForceTopK]]'s — queries broadcast (with their
    * norms PRECOMPUTED, the e17 redundant-per-pair-norms lesson; chunk
    * norms precompute row-local on the scan side too), ONE chunk scan,
    * WindowGroupLimit top-k. Chunking is a pure narrow map, so the whole
    * retrieval is scan-bound; swap the brute-force ranking for the
    * IVF/JL/PQ tiers over the same chunk embedding when the chunk table
    * outgrows a scan per query batch. */
  def chunkRetrieveTopK(
      docs: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k: Int, chunkSize: Int = 16, buckets: Int = 64): DataFrame =
    chunkRetrieveFromIndex(chunkIndex(docs, idCol, textCol, chunkSize,
      buckets), queries, idCol, textCol, k, buckets)

  /** The persistable chunk-embedding INDEX behind [[chunkRetrieveTopK]]:
    * `(doc_id, chunk_id, __cv dense hashed-BoW vector, __css norm²)`.
    * Chunking, embedding, and the norm are all ROW-LOCAL, so a delta's
    * index rows are bit-identical to what a full rebuild computes for
    * them — the fact the streamed maintenance (s25) rides, exactly like
    * [[jlExtendIndex]]/[[ivfExtendIndex]]. */
  def chunkIndex(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 16, buckets: Int = 64): DataFrame =
    chunkIndexOfChunks(
      Packing.chunkTokens(docs, idCol, textCol, chunkSize, 0)
        .select(col(idCol).as("doc_id"), col("chunk_id"), col("chunk_text")),
      buckets)

  /** [[chunkIndex]] over an ALREADY-CHUNKED frame (doc_id, chunk_id,
    * chunk_text) — for pipelines that share one chunking pass across
    * several consumers (e28 feeds the same chunks to the BM25 and dense
    * rankers). Embedding + norm stay row-local. */
  def chunkIndexOfChunks(chunks: DataFrame, buckets: Int = 64): DataFrame = {
    import graft.functions.GraftFunctions.dotI64
    chunks.select(col("doc_id"), col("chunk_id"),
        Multimodal.denseBowOf(col("chunk_text"), buckets).as("__cv"))
      .withColumn("__css", dotI64(col("__cv"), col("__cv")))
  }

  /** [[chunkRetrieveTopK]] served from a prebuilt (persisted or
    * stream-maintained) [[chunkIndex]] table: queries embed + norm once,
    * broadcast, and rank against the index's precomputed vectors.
    * `buckets` must equal the index's build-time buckets: a mismatch
    * fails LOUDLY on the first scored pair (the dot_i64 kernel raises on
    * ragged inputs — never a silently truncated dot product). */
  def chunkRetrieveFromIndex(
      index: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1)
    import graft.functions.GraftFunctions.dotI64
    val q = queries
      .select(col(idCol).as("query_id"),
        Multimodal.denseBowOf(col(textCol), buckets).as("__qv"))
      .withColumn("__qss", dotI64(col("__qv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_q").desc, col("doc_id").asc, col("chunk_id").asc)
    // the streamed index side carries the O(|chunks|·|queries|) dot/cosine
    // work — floor its scan parallelism (r21, guide §2.6)
    Par.floor(index, "doc_id").crossJoin(broadcast(q))
      .withColumn("__dot", dotI64(col("__cv"), col("__qv")))
      .withColumn("cos_q",
        when(col("__css") > 0 && col("__qss") > 0,
          floor(col("__dot").cast("double") /
            (sqrt(col("__css").cast("double")) *
              sqrt(col("__qss").cast("double"))) * 10000) / 10000)
          .otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("chunk_id"),
        col("cos_q"))
  }

  // ---- chunk-level IVF serving tier (e27) -------------------------------
  //
  // chunkRetrieveFromIndex is the right plan for BATCH scoring (one scan
  // amortized over a broadcast query batch) but the wrong one for RAG
  // SERVING at 100 TB, where the chunk table is corpus-sized × (tokens /
  // chunkSize) and a full scan per query batch cannot stand. These three
  // functions make the "swap in the IVF tier" escape hatch REAL: the
  // bigint chunk vectors cast row-locally to float for the coarse
  // quantizer (counts ≤ chunk token count — exactly representable), cell
  // assignment rides the NearestCellF32 reference-object kernel (a narrow
  // map, so s25's streamed maintenance carries over unchanged: a delta's
  // (vector, cell) rows are bit-identical to a rebuild's), and serving
  // joins only the probed cells — partition-pruned (DPP) when the index
  // is persisted partitioned by cell_id, the e10 pattern.

  /** [[chunkIndex]] + a row-local coarse-quantizer cell assignment —
    * the persistable, cell-partitioned chunk ANN index. Write it
    * `.partitionBy("cell_id")` so [[chunkRetrieveFromIvfIndex]]'s
    * cell join prunes the scan to probed cells. Assignment depends only
    * on the row and the frozen codebook, so incremental maintenance
    * (s25) composes: extending the index assigns only delta rows. */
  def chunkIvfIndex(
      index: DataFrame, cents: Seq[(Long, Array[Float])]): DataFrame =
    withNearestCell(
      index.withColumn("__cvf", col("__cv").cast("array<float>")),
      "__cvf", cents)
      .drop("__cvf")

  /** Train the chunk-space coarse quantizer (seeded k-means over the
    * float-cast chunk vectors) to a driver-held codebook — the offline
    * step of the chunk ANN tier, memoized per corpus snapshot exactly
    * like the e06/e10 codebooks. The synthesized `doc:chunk` key only
    * seeds the deterministic init order. */
  def chunkIvfCentroidsCollected(
      index: DataFrame, nCells: Int, iters: Int = 2,
      seed: Long = 42L): Seq[(Long, Array[Float])] =
    kmeansCentroidsCollected(
      index.select(
        concat_ws(":", col("doc_id"), col("chunk_id")).as("__ck"),
        col("__cv").cast("array<float>").as("__cvf")),
      "__ck", "__cvf", nCells, iters, seed)

  /** [[chunkRetrieveFromIndex]] served through the cell-pruned IVF path:
    * the query batch embeds + norms once, windows for its `nProbe`
    * nearest cells against the broadcast codebook, and ONLY those cells'
    * index rows pay the exact dot_i64 re-rank — identical scoring
    * arithmetic to the brute-force path (floor-quantized cosine over the
    * integer vectors, zero-norm → 0.0), so at nProbe = |cells| the output
    * EQUALS the exact ranking row-for-row (the e27 gate's exhaustive
    * point). Output: (query_id, rank, doc_id, chunk_id, cos_q). */
  def chunkRetrieveFromIvfIndex(
      ivfIndex: DataFrame, cents: Seq[(Long, Array[Float])],
      queries: DataFrame, idCol: String, textCol: String,
      k: Int, nProbe: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1 && nProbe >= 1)
    import graft.functions.GraftFunctions.dotI64
    val centsDf = centroidsDF(ivfIndex.sparkSession, cents)
    val q = queries
      .select(col(idCol).as("query_id"),
        Multimodal.denseBowOf(col(textCol), buckets).as("__qv"))
      .withColumn("__qss", dotI64(col("__qv"), col("__qv")))
      .withColumn("__qvf", col("__qv").cast("array<float>"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("__ccos").desc, col("cell_id").asc)
    val probes = q.crossJoin(broadcast(centsDf))
      .withColumn("__ccos", cosineF32(col("__qvf"), col("centroid")))
      .withColumn("__crk", row_number().over(wc))
      .filter(col("__crk") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__qss"), col("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_q").desc, col("doc_id").asc, col("chunk_id").asc)
    ivfIndex.join(broadcast(probes), Seq("cell_id"))
      .withColumn("__dot", dotI64(col("__cv"), col("__qv")))
      .withColumn("cos_q",
        when(col("__css") > 0 && col("__qss") > 0,
          floor(col("__dot").cast("double") /
            (sqrt(col("__css").cast("double")) *
              sqrt(col("__qss").cast("double"))) * 10000) / 10000)
          .otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("chunk_id"),
        col("cos_q"))
  }

  /** Incrementally maintain a persisted [[chunkIvfIndex]] table under
    * exactly-once versioned commits — [[ivfExtendIndex]]'s economics at
    * chunk granularity: the quantizer stays FROZEN, each batch chunks +
    * embeds + cell-assigns ONLY its own docs (all row-local, so the
    * delta's index rows are bit-identical to a rebuild's) and lands as a
    * new immutable segment under the monotone doc-id guard — the commit
    * never reads or rewrites prior index bytes; a replayed batchId is a
    * no-op. Serve the committed table through
    * [[chunkRetrieveFromIvfIndex]]. */
  def chunkIvfExtendIndex(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      cents: Seq[(Long, Array[Float])], batchId: Long,
      chunkSize: Int = 16, buckets: Int = 64): Unit =
    graft.operators.IncrementalAgg.appendOnce(spark, statePath,
      chunkIvfIndex(chunkIndex(deltaDocs, idCol, textCol, chunkSize,
        buckets), cents),
      batchId, guardIdCol = "doc_id")

  /** [[chunkRetrieveFromIvfIndex]] over a VERSIONED chunk-IVF state
    * ([[chunkIvfExtendIndex]]'s artifact) with a version-exact query-
    * result cache — [[graft.operators.IncrementalAgg.cachedServe]]
    * instantiated for the dense tier: the key is md5(query text, k,
    * nProbe, buckets, STATE VERSION), so every extend or retraction
    * invalidates by construction; hits are one broadcast join, misses
    * pay the cell-pruned serve once and append O(misses), and an
    * all-hit batch never builds the index subtree. The frozen codebook
    * is part of the state's identity (a takedown never retrains), so it
    * does not enter the digest. Cached cos_q doubles round-trip parquet
    * exactly — cached ≡ direct bit-for-bit. */
  def chunkRetrieveFromIvfStateCached(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      cachePath: String, cents: Seq[(Long, Array[Float])],
      queries: DataFrame, idCol: String, textCol: String,
      k: Int, nProbe: Int, buckets: Int = 64): DataFrame = {
    require(k >= 1 && nProbe >= 1)
    val version = graft.operators.IncrementalAgg
      .latestVersion(spark, statePath).getOrElse(
        throw new IllegalStateException(
          s"chunkRetrieveFromIvfStateCached: no committed index under " +
            statePath))
    graft.operators.IncrementalAgg.cachedServe(spark, cachePath, queries,
      idCol, textCol,
      digestSalt = Seq(version.toString, k.toString, nProbe.toString,
        buckets.toString),
      serve = mq => chunkRetrieveFromIvfIndex(
        graft.operators.IncrementalAgg.readState(spark, statePath), cents,
        mq, "query_id", "__qtext", k, nProbe, buckets))
  }

  /** Cache maintenance for [[chunkRetrieveFromIvfStateCached]]'s result
    * cache — the dense twin of
    * [[graft.operators.Bm25Index.maintainQueryCache]]: evict entries
    * salted with superseded index versions (takedowns churn versions
    * under this cache — e40's regime) and fold the per-batch segments,
    * once more than `maxSegments` have accumulated. Returns whether a
    * prune committed. */
  def maintainChunkQueryCache(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      cachePath: String, k: Int, nProbe: Int, buckets: Int = 64,
      maxSegments: Int = 8): Boolean = {
    val version = graft.operators.IncrementalAgg
      .latestVersion(spark, statePath).getOrElse(
        throw new IllegalStateException(
          s"maintainChunkQueryCache: no committed index under $statePath"))
    graft.operators.IncrementalAgg.maintainCachedServe(spark, cachePath,
      Seq(version.toString, k.toString, nProbe.toString, buckets.toString),
      graft.operators.IncrementalAgg.latestVersion(spark, cachePath)
        .getOrElse(-1L) + 1L,
      maxSegments)
  }

  /** Recall-vs-nProbe OPERATING CURVE for the chunk IVF tier —
    * [[ivfRecallCurve]]'s construction over the chunk index: recall@k of
    * the cell-pruned serve against the exact brute-force ranking from
    * the SAME index rows. The same two properties make it gateable:
    * (1) probed-cell sets NEST in nProbe (window top-n of one fixed
    * cell ranking), so the candidate set grows and — under the global
    * (cos_q DESC, doc_id, chunk_id) total order — overlap@k is monotone;
    * (2) nProbe = |cells| admits every index row and the scoring
    * arithmetic is identical, so recall is exactly 1. `ivfIndex` is NOT
    * checkpointed here: when it is a cell-partitioned parquet read, each
    * setting's plan must keep the partitioned scan so DPP prunes it
    * (PlansSpec pins the pruned shape on the e27 row). */
  def chunkIvfRecallCurve(
      ivfIndex: DataFrame, cents: Seq[(Long, Array[Float])],
      queries: DataFrame, idCol: String, textCol: String,
      k: Int, nProbes: Seq[Int], buckets: Int = 64): DataFrame = {
    require(nProbes.nonEmpty)
    val exact = chunkRetrieveFromIndex(ivfIndex, queries, idCol, textCol,
        k, buckets)
      .select(col("query_id"), col("doc_id"), col("chunk_id"),
        lit(1).as("in_bf"))
      .localCheckpoint(true)
    try {
      nProbes.map { np =>
        chunkRetrieveFromIvfIndex(ivfIndex, cents, queries, idCol, textCol,
            k, np, buckets)
          .select(col("query_id"), col("doc_id"), col("chunk_id"),
            lit(1).as("in_t"))
          .join(exact, Seq("query_id", "doc_id", "chunk_id"), "full_outer")
          .agg((count(when(col("in_t") === 1 && col("in_bf") === 1, 1))
            .cast("double") / count(col("in_bf"))).as("recall"))
          .select(lit(np).as("n_probe"), col("recall"))
      }.reduce(_ unionAll _)
        .localCheckpoint(true)
    } finally Dedup.release(exact)
  }

  /** Reciprocal-Rank Fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-retrieval combiner: given N independently-ranked
    * candidate lists for the same query (here typically
    * [[TextAnalysis.bm25TopK]]'s keyword ranking and [[bruteForceTopK]]'s
    * dense kNN), fuse on `score(d) = Σ_lists 1/(k₀ + rank_d(l))`, treating
    * a list that doesn't contain d as contributing 0. k₀ = 60 is the
    * paper's constant. A document ranked highly by only ONE modality
    * still surfaces — the property that makes RRF the default fusion in
    * hybrid search stacks (Elasticsearch, Vespa, most RAG pipelines).
    *
    * Determinism: each term is the INTEGER `10⁶ div (k₀ + rank)` — ranks
    * are integers and k₀ + rank ≤ a few hundred, so the fixed-point floor
    * loses nothing that reorders (distinct rationals 1/(k₀+r) for r ≤ 940
    * stay distinct at 10⁻⁶) and the summed `rrf_score` is exact integer
    * algebra, hash-identical in any engine. Ties break by id.
    *
    * Scale shape: every input is an already-ranked TOP-K list — the
    * corpus-sized work happened upstream in the rankers — so the
    * full-outer merge and the single global ranking window operate on
    * ≤ Σ|lists|·k rows by construction (hundreds, not the corpus). Each
    * input must carry (`idName`, `rank`). */
  def rrfFuse(
      lists: Seq[DataFrame], idName: String, k: Int,
      k0: Int = 60): DataFrame = {
    require(lists.nonEmpty && k >= 1 && k0 >= 1)
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idName),
        expr(s"1000000 div ($k0 + rank)").as(s"__rrf_$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idName), "full_outer"))
    val contribs = joined.select(col(idName) +: tagged.indices.map(i =>
      coalesce(col(s"__rrf_$i"), lit(0L)).as(s"__c_$i")): _*)
    val score = tagged.indices.map(i => col(s"__c_$i")).reduceLeft(_ + _)
    val w = Window.orderBy(col("rrf_score").desc, col(idName).asc)
    contribs
      .withColumn("rrf_score", score)
      .withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= k)
      .select(col("rrf_rank"), col(idName), col("rrf_score"))
  }

  /** [[rrfFuse]] generalized to a QUERY BATCH — the production hybrid-
    * retrieval shape: every input list carries a query column plus the
    * ranked item's key columns (`queryName`, `idNames...`, `rank`), and
    * fusion happens PER QUERY in one pass — one full-outer merge on
    * (query, item) and one query-partitioned ranking window, instead of
    * one [[rrfFuse]] invocation (and one plan) per probe. Identical
    * fixed-point arithmetic (`10⁶ div (k₀ + rank)` summed as exact
    * integers; a list missing the item contributes 0 — the
    * single-modality-surfaces property, per query).
    *
    * Scale shape: inputs are per-query TOP-K lists, so the merge and the
    * window operate on ≤ |queries|·Σ|lists|·k rows, hash-partitioned by
    * query — no global funnel (the window partitions by `queryName`,
    * unlike [[rrfFuse]]'s documented list-sized global window). Output:
    * (queryName, rrf_rank, idNames..., rrf_score). */
  def rrfFusePerQuery(
      lists: Seq[DataFrame], queryName: String, idNames: Seq[String],
      k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty && idNames.nonEmpty && k >= 1 && k0 >= 1)
    val keys = queryName +: idNames
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(keys.map(col) :+
        expr(s"1000000 div ($k0 + rank)").as(s"__rrf_$i"): _*)
    }
    val joined = tagged.reduce((a, b) => a.join(b, keys, "full_outer"))
    val contribs = joined.select(keys.map(col) ++ tagged.indices.map(i =>
      coalesce(col(s"__rrf_$i"), lit(0L)).as(s"__c_$i")): _*)
    val score = tagged.indices.map(i => col(s"__c_$i")).reduceLeft(_ + _)
    val w = Window.partitionBy(col(queryName))
      .orderBy(col("rrf_score").desc +: idNames.map(col(_).asc): _*)
    contribs
      .withColumn("rrf_score", score)
      .withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= k)
      .select(col(queryName) +: col("rrf_rank") +: idNames.map(col) :+
        col("rrf_score"): _*)
  }

  /** Retrieval EVALUATION against labeled relevance — the measurement
    * harness every retrieval deployment runs (distinct from the e23/e27
    * recall-vs-exact SELF-consistency gates: here relevance is ground
    * truth, planted or human-labeled, and the metric is quality of the
    * whole stack). Per query: the first rank at which ANY relevant item
    * appears within the top `k` (0 = miss) and its reciprocal-rank as
    * the exact fixed-point integer `10⁶ div rank` — integer algebra, so
    * MRR/hit-rate aggregates replicate bit-exactly in any engine (a
    * float 1/rank would too, but the fixed-point form keeps downstream
    * SUMS exact — the e24 contract).
    *
    * `ranked` carries (queryName, rank, idName); `qrels` carries
    * (queryName, idName) relevant pairs. Scale shape: qrels are
    * label-set-sized (broadcast join against the top-k lists, which are
    * |queries|·k by construction); one query-keyed aggregate. Output:
    * (queryName, first_rel_rank, rr_fp) — one row per DISTINCT qrels
    * query, misses included. */
  def retrievalEval(
      ranked: DataFrame, qrels: DataFrame, queryName: String,
      idName: String, k: Int): DataFrame = {
    require(k >= 1)
    val first = ranked.filter(col("rank") <= k)
      .join(broadcast(qrels.select(col(queryName), col(idName)).distinct()),
        Seq(queryName, idName))
      .groupBy(col(queryName))
      .agg(min(col("rank")).cast("long").as("first_rel_rank"))
    qrels.select(col(queryName)).distinct()
      .join(first, Seq(queryName), "left")
      .select(col(queryName),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("rr_fp"))
  }

  /** Fixed-point nDCG discount table `floor(10⁶ / log2(r+1))` for ranks
    * 1..k — computed ONCE driver-side and baked as LITERALS into both the
    * Spark plan and the DuckDB oracle, so the irrational log2 never has
    * to agree bit-for-bit across engines (the same move as the d11
    * quality quantization: pin the constants, keep the algebra integer). */
  def ndcgDiscountsFp(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** [[retrievalEval]] extended to GRADED relevance — the full metric set
    * a retrieval deployment reads (TREC-style): per query, first relevant
    * rank + reciprocal rank (as in e29), plus recall@k and nDCG@k over
    * qrels carrying an integer `gainName` (fixed-point, e.g. ×10⁶).
    * All metrics are exact integer algebra: recall@k is
    * `10⁶·|rel ∩ topk| div |rel|`; DCG sums `gain × disc_fp(rank)` over
    * relevant hits with the [[ndcgDiscountsFp]] literal table; IDCG sums
    * the k largest gains against positions 1..; nDCG@k is the integer
    * division `(DCG·10⁶) div IDCG` — so every column hash-replicates in
    * any engine.
    *
    * A ranked list finer-grained than the label unit (chunk lists vs
    * doc-level qrels — the RAG serving shape) counts each labeled item
    * ONCE at its BEST-ranked occurrence: without the dedup a doc whose
    * chunks fill two top-k slots would score recall 200%.
    *
    * Scale shape: qrels are label-set-sized — one broadcast join against
    * the |queries|·k top-k lists, one hit-side and one label-side
    * aggregate (the per-query gain list for IDCG is ≤ |rel per query|,
    * a labeling artifact, never corpus-sized). Output one row per
    * DISTINCT qrels query, misses included (all-zero metrics). */
  def retrievalEvalGraded(
      ranked: DataFrame, qrels: DataFrame, queryName: String,
      idName: String, gainName: String, k: Int): DataFrame = {
    require(k >= 1)
    val disc = typedLit(ndcgDiscountsFp(k))
    val q = qrels.select(col(queryName), col(idName),
      col(gainName).cast("long").as("__gain"))
    val hits = ranked.filter(col("rank") <= k)
      .groupBy(col(queryName), col(idName))
      .agg(min(col("rank")).cast("int").as("rank"))
      .join(broadcast(q.select(col(queryName), col(idName), col("__gain"))
        .distinct()), Seq(queryName, idName))
      .groupBy(col(queryName))
      .agg(min(col("rank")).cast("long").as("__frr"),
        count(lit(1)).as("__hits"),
        sum(col("__gain") * element_at(disc, col("rank").cast("int")))
          .as("__dcg"))
    val ideal = q.select(col(queryName), col(idName), col("__gain")).distinct()
      .groupBy(col(queryName))
      .agg(count(lit(1)).as("n_rel"),
        slice(sort_array(collect_list(col("__gain")), asc = false), 1, k)
          .as("__top_gains"))
      .withColumn("__idcg", aggregate(
        zip_with(col("__top_gains"), disc, (g, d) => g * d),
        lit(0L), (acc, x) => acc + coalesce(x, lit(0L))))
      .drop("__top_gains")
    ideal.join(hits, Seq(queryName), "left")
      .select(col(queryName),
        coalesce(col("__frr"), lit(0L)).as("first_rel_rank"),
        coalesce(expr("1000000 div __frr"), lit(0L)).as("rr_fp"),
        col("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("n_rel_in_topk"),
        expr("(1000000 * coalesce(__hits, 0)) div n_rel").as("recall_fp"),
        coalesce(expr("(coalesce(__dcg, 0) * 1000000) div nullif(__idcg, 0)"),
          lit(0L)).as("ndcg_fp"))
  }

  /** Nearest-prototype balanced curation (the SSL-prototypes / cluster-
    * balanced selection family): assign every vector to its most similar
    * prototype, then keep only the top `keepFrac` most PROTOTYPICAL
    * vectors per cell — pruning each region of embedding space
    * proportionally instead of letting dense regions dominate the kept
    * corpus (the failure mode of a single global similarity cutoff).
    *
    * Prototypes are the `numSeeds` lowest-id vectors — a deterministic,
    * engine-replicable stand-in for trained centroids; swap in the e06
    * k-means codebook for production (same serving shape). The seed
    * codebook is collected once (numSeeds × dim floats — driver-held
    * codebook, same pattern as e06/e08) and baked into a row-local argmax
    * expression, so assignment is a NARROW map over one corpus scan: no
    * join, no shuffle. The only exchange is the per-cell prototypicality
    * window (hash on cell id). Ties break to the smaller seed id /
    * smaller vec id, making the full output deterministic. */
  def prototypePrune(
      emb: DataFrame, idCol: String, vecCol: String,
      numSeeds: Int, keepFrac: Double): DataFrame = {
    require(numSeeds > 0 && keepFrac > 0.0 && keepFrac <= 1.0)
    val seeds: Array[(Long, Array[Float])] = emb
      .filter(col(idCol) < numSeeds)
      .select(col(idCol), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    // row-local argmax over the baked codebook: struct ordering compares
    // cosine first, then -seed_id, so ties resolve to the smallest seed
    // (greatest() needs ≥2 args — a single-seed codebook is its own argmax)
    val candidates = seeds.map { case (sid, vec) =>
      struct(
        cosineF32(col(vecCol), typedLit(vec)).as("cos"),
        lit(-sid).as("negid"))
    }
    val best =
      if (candidates.length == 1) candidates.head else greatest(candidates: _*)
    val assigned = emb.select(col(idCol), col(vecCol))
      .withColumn("__best", best)
      .select(col(idCol),
        (-col("__best").getField("negid")).as("cell"),
        col("__best").getField("cos").as("cos"))
    val w = Window.partitionBy(col("cell"))
    assigned
      .withColumn("rank", row_number().over(
        w.orderBy(col("cos").desc, col(idCol).asc)))
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("rank") <= ceil(col("__cnt") * keepFrac))
      .select(col("cell"), col(idCol), col("rank"),
        (floor(col("cos") * 10000) / 10000).as("cosine_q"))
  }

  /** Margin-based bitext mining (the ccMatrix/LASER criterion): for each
    * source vector, its best target by cosine, kept when the margin —
    * cos(x,y) against the mean of both sides' top-k neighbor cosines —
    * clears a threshold. Exactness: every pair cosine is floor-quantized
    * ONCE to a 10⁶ fixed-point integer, and ALL downstream algebra
    * (top-k ranking, neighborhood sums, the margin test) is integer —
    * the ratio test margin > τ becomes the cross-multiplied
    * `2·k·τden·cos_fp > τnum·(sum_src_fp + sum_tgt_fp)`, which is the
    * DEFINITION here (≡ the ratio when the neighborhood sums are
    * positive, the regime mined pairs live in), so both engines replicate
    * bit-for-bit. Ranking orders by (cos_fp DESC, id) — on the QUANTIZED
    * value, so quantization ties break identically everywhere.
    *
    * This is the exact/gate form: one cross join scored by the codegen'd
    * cosine kernel, two window ranks (one shuffle each, keyed by either
    * side), two top-k sum aggregates, one final join. At 100 TB the
    * cross join is replaced by an ANN shortlist (the e27 IVF tier or SRP
    * bands) and margins compute on the shortlist — the standard
    * ccMatrix decomposition; the criterion and everything downstream of
    * the candidate set is unchanged. */
  def marginMinePairs(
      src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
      k: Int, tauNum: Long = 105L, tauDen: Long = 100L): DataFrame = {
    require(k >= 1 && tauNum > 0 && tauDen > 0)
    // O(|src|·|tgt|) pair cosines ride the cross join's streamed side —
    // floor its scan parallelism (r21, guide §2.6; no-op at scale)
    val a = Par.floor(
      src.select(col(idCol).as("src_id"), col(vecCol).as("__va")), "src_id")
    val b = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("__vb"))
    val pairs = a.crossJoin(b)
      .select(col("src_id"), col("tgt_id"),
        floor(cosineF32(col("__va"), col("__vb")) * 1000000d)
          .cast("long").as("cos_fp"))
    val wS = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_fp").desc, col("tgt_id"))
    val wT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos_fp").desc, col("src_id"))
    val rk = pairs.withColumn("__rs", row_number().over(wS))
      .withColumn("__rt", row_number().over(wT))
    val sumS = rk.filter(col("__rs") <= k).groupBy(col("src_id"))
      .agg(sum(col("cos_fp")).as("sum_src_fp"))
    val sumT = rk.filter(col("__rt") <= k).groupBy(col("tgt_id"))
      .agg(sum(col("cos_fp")).as("sum_tgt_fp"))
    rk.filter(col("__rs") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos_fp"))
      .join(sumS, Seq("src_id"))
      .join(sumT, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos_fp"),
        col("sum_src_fp"), col("sum_tgt_fp"),
        (lit(2L * k * tauDen) * col("cos_fp") >
          lit(tauNum) * (col("sum_src_fp") + col("sum_tgt_fp")))
          .as("mined"))
  }
}
