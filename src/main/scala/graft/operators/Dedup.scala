package graft.operators

import graft.functions.GraftFunctions._
import graft.sources.Sinks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - Exact dedup is a single hash-shuffle on a 64-bit digest of the payload
  *    (never shuffles the full text as the key).
  *  - MinHash-LSH is the standard band trick: signature → `bands` keys →
  *    one shuffle groups candidates per band-bucket; all-pairs comparison
  *    happens only inside a bucket. Cost is O(candidates), not O(n²).
  *  - Candidate verification re-joins the (small) candidate-pair set back to
  *    the corpus — two hash joins on doc ids, both AQE-optimizable.
  *  - SimHash buckets by rotating bit-blocks so any pair within Hamming
  *    distance k collides in ≥1 block (pigeonhole over 4 blocks → k ≤ 3).
  */
object Dedup {

  /** Deterministically release the blocks behind a frame this module
    * materialized. `Dataset.unpersist()` on a localCheckpointed frame is a
    * cache-manager no-op (the frame was never registered there; its blocks
    * belong to the underlying checkpoint RDD and are otherwise freed only
    * when the RDD is GC'd), so checkpoint roots release that RDD directly.
    * Plain persisted frames fall through to the normal unpersist. The frame
    * must not be used afterwards — its lineage is gone. */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => df.unpersist()
    }

  /** Lowercased whitespace tokens (shared with the DuckDB oracle). */
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** Distinct word n-gram shingles as strings; empty array when the doc has
    * fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val t = toks(text)
    val raw = when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    ).otherwise(array().cast("array<string>"))
    array_distinct(raw)
  }

  /** 64-bit hashes of the distinct shingle set — single-pass custom
    * expression (see [[graft.functions.ShingleHashes]] for why the HOF
    * composition is quadratic). */
  def shingleHashes(text: Column, n: Int): Column =
    shingleHashesOf(text, n)

  // ---- exact ---------------------------------------------------------

  /** Exact dedup: keep the lowest id per identical payload. The window
    * partitions on a digest-first composite key (xxhash64(payload),
    * payload): rows still carry the payload across the shuffle — they must,
    * to confirm digest collisions — but partition hashing and sort
    * comparisons touch the 8-byte digest before the full payload, and the
    * digest spreads near-identical long payloads evenly. */
  def exactDedup(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(payloadCol)), col(payloadCol))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate clusters: payload → ids, sizes. */
  def exactDupGroups(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.groupBy(col(payloadCol))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n_copies") > 1)

  // ---- MinHash + LSH ---------------------------------------------------

  /** Per-doc distinct shingle-hash sets, materialized once.
    *
    * The shingle expression tree (tokenize → n-gram → hash) is large and
    * interpreted; every downstream consumer (banding, both sides of the
    * candidate self-join, verification) must reuse the *materialized*
    * hashes, not re-inline the tree. At cluster scale this is the
    * "signature table" you'd persist/bucket once per corpus snapshot; here
    * `persist()` gives the same single-evaluation property.
    *
    * Cache lifecycle: the caller owns the returned frame's cache — call
    * `.unpersist()` when done. The pipeline endings in this object
    * ([[minhashNearDups]] etc.) do exactly that: they materialize their
    * (small) result eagerly and release every intermediate they persisted,
    * so repeated invocations in one session leave no cached blocks behind. */
  def shingleHashTable(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    // tokenize → n-gram → hash is the pipeline's heaviest per-row work
    // and would otherwise run inside the input's (often single-task) scan
    // stage; every downstream pass (128-hash MinHash signatures, banding,
    // Jaccard verify) inherits this frame's partitioning, so floor it
    // here once (r21, guide §2.6; no-op at scale)
    Par.floor(df.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"),
        shingleHashes(col(textCol), shingleN).as("sh"))
      // docs with no shingles (fewer than n tokens) can't be near-dups and
      // would all collide on the empty signature — drop them before banding
      .filter(size(col("sh")) > 0)
      .persist()

  /** Candidate probability of the (bands, rowsPerBand) MinHash banding at
    * Jaccard `j` — the LSH S-curve 1 − (1 − j^r)^b. */
  def lshRecallAt(bands: Int, rowsPerBand: Int, jaccard: Double): Double =
    1.0 - math.pow(1.0 - math.pow(jaccard, rowsPerBand), bands)

  /** S-curve parameter solver: among the exact factorizations
    * b·r = numHashes, return the (bands, rowsPerBand) with the LARGEST r
    * whose S-curve still clears `recallFloor` at Jaccard `threshold`.
    * Larger r = steeper curve = exponentially fewer sub-threshold
    * candidate pairs (per-band collision probability j^r), so the largest
    * feasible r minimizes candidate mass — the standard MMDS §3.4 tuning,
    * replacing hand-picked band constants. Fails loudly when no
    * factorization reaches the floor (add hashes or lower the floor).
    *
    * Floors are use-case-specific: a recall GATE row verified against an
    * exact oracle needs near-certainty (e.g. 1−1e−7 — a single missed
    * pair fails the gate), while a best-effort curation pass can trade
    * recall 0.9 for a much steeper curve. */
  def lshParams(
      numHashes: Int, threshold: Double, recallFloor: Double): (Int, Int) = {
    require(numHashes > 0 && threshold > 0 && threshold < 1 &&
      recallFloor > 0 && recallFloor < 1)
    val feasible = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(r => (numHashes / r, r))
      .filter { case (b, r) => lshRecallAt(b, r, threshold) >= recallFloor }
    require(feasible.nonEmpty,
      s"no (bands, rows) factorization of $numHashes hashes reaches " +
        s"recall $recallFloor at J=$threshold - add hashes or lower the floor")
    feasible.maxBy(_._2)
  }

  /** Band keys from a MinHash signature: bucket = hash-combine of each band
    * slice, computed by the single-pass [[graft.functions.BandKeys64]]
    * kernel (the HOF slice→stringify→xxhash64 formulation allocated 32
    * strings per row). `rowsPerBand` is implied by signature length / bands
    * (the kernel enforces divisibility); kept in the signature for callers
    * that size bands from it. */
  private def banded(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(
      col("doc_id"),
      posexplode(bandKeys64(col("sig"), bands))
    ).toDF("doc_id", "band", "bucket")

  /** Candidate near-duplicate pairs via MinHash banding over a
    * [[shingleHashTable]]. Docs sharing any band bucket become a pair;
    * one shuffle on (band, bucket), O(candidates) not O(n²). */
  def minhashCandidatesFromHashes(
      hashes: DataFrame, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sig = hashes.select(col("doc_id"),
      minhashSignature(col("sh"), numHashes, seed).as("sig")).persist()
    try {
      val b = banded(sig, bands, numHashes / bands)
      // candidate set is O(near-dups) — materialize it eagerly (lineage
      // truncated) so the signature cache can be released right here
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .localCheckpoint(true)
    } finally sig.unpersist()
  }

  /** Candidate pairs straight from a documents frame. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    val hashes = shingleHashTable(df, idCol, textCol, shingleN)
    // result is already eagerly materialized inside, so the hash cache can
    // be released before returning
    try minhashCandidatesFromHashes(hashes, numHashes, bands, seed)
    finally hashes.unpersist()
  }

  /** Exact Jaccard for given id pairs over materialized hash sets.
    * |A∩B|/|A∪B| on 64-bit shingle hashes equals the string-shingle Jaccard
    * up to negligible collision probability (~n²/2⁶⁴ per doc pair). */
  def verifyJaccardFromHashes(hashes: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(hashes.withColumnsRenamed(Map("doc_id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(hashes.withColumnsRenamed(Map("doc_id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))

  /** Exact Jaccard over distinct *string* shingle sets for given id pairs
    * (reference/oracle form of [[verifyJaccardFromHashes]]). */
  def verifyJaccard(
      docs: DataFrame, pairs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"))
    pairs
      .join(sh.withColumnsRenamed(Map("doc_id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle-hash once → band →
    * candidates → exact-Jaccard verify → pairs over the threshold. */
  def minhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L): DataFrame = {
    val hashes = shingleHashTable(docs, idCol, textCol, shingleN)
    try {
      val cands = minhashCandidatesFromHashes(hashes, numHashes, bands, seed)
      // verified pair set is small; materializing it here lets the hash
      // cache and the candidate checkpoint go immediately instead of
      // leaking until session end
      try verifyJaccardFromHashes(hashes, cands)
        .filter(col("jaccard") >= threshold)
        .localCheckpoint(true)
      finally release(cands)
    } finally hashes.unpersist()
  }

  /** Brute-force n-gram Jaccard over all pairs — the small-data oracle path
    * and the verifier of LSH recall. O(n²): only for bounded inputs.
    * Operates on 64-bit shingle hashes (equal to string-shingle Jaccard up
    * to ~n²/2⁶⁴ collision probability; equality asserted in OperatorsSpec),
    * so the pairwise intersect/union compares longs, not strings. */
  def jaccardAllPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    // drop shingle-less docs: they can't be near-dups, and an empty∪empty
    // pair would divide by zero under ANSI mode
    val sh = docs.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Candidate pair generation for [[fuzzyPairs]]: partition-based
    * edit-distance filtering (the PassJoin scheme — Li, Deng, Feng,
    * "Pass-Join: a partition-based method for similarity joins",
    * PVLDB 5(3), 2011). Every doc is split (in its "indexed" role) into
    * τ+1 contiguous CONTENT segments; by pigeonhole, any string within
    * edit distance τ must contain at least one segment verbatim, shifted
    * by at most the edits around it. Each doc (in its "probe" role)
    * extracts, for every candidate indexed length l ∈ [m−τ, m+τ] and
    * segment i, the substrings in the feasible shift window
    * |δ| + |Δ−δ| ≤ τ (Δ = m−l) — so candidates must share an actual
    * 8-byte content-hash key (i, l, xxhash64(segment)), never just a
    * length. GUARANTEED recall (unlike a MinHash prefilter) — the output
    * pair set is provably identical to all-pairs filtering, so the exact
    * DuckDB oracle still matches.
    *
    * Docs shorter than τ+1 chars can't be segmented into non-empty parts;
    * any two such docs are trivially within distance τ (ed ≤ max length),
    * so the short pool pairs all-against-all — that join is OUTPUT-bound,
    * not a filtering weakness (every short-short pair is a genuine
    * result).
    *
    * Scale shape: one equi-join shuffle on 8-byte content keys; per-doc
    * key fan-out is O(τ²) small rows (τ=6 → ≤ 7 indexed + ~400 probe
    * keys), independent of corpus size. A length-concentrated corpus
    * (tweets, log lines) no longer degenerates: within one length, keys
    * split by CONTENT. */
  private[graft] def fuzzyCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val base = docs.select(col(idCol).as("__id"), col(textCol).as("__txt"),
      length(col(textCol)).as("__len"))
    val tau = maxDist
    val k = tau + 1
    // short pool: both lengths ≤ τ ⇒ ed ≤ max(len) ≤ τ — all pairs qualify
    val short = base.filter(col("__len") <= tau).select(col("__id"))
    val shortPairs = short.as("a").join(short.as("b"),
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    // indexed role: k segments of a doc with len ≥ k (all non-empty).
    // Even partition: first (len mod k) segments get an extra char.
    def segLen(l: Column, i: Column): Column =
      floor(l / k).cast("int") + when(i < l % k, 1).otherwise(0)
    def segStart(l: Column, i: Column): Column = // 1-based for substr
      (i * floor(l / k).cast("int") + least(i, l % k) + 1).cast("int")
    val idx = base.filter(col("__len") >= k)
      .select(col("__id").as("__id_i"), col("__txt"), col("__len"),
        explode(sequence(lit(0), lit(tau))).as("__i"))
      .select(col("__id_i"), col("__i"), col("__len").as("__l"),
        xxhash64(col("__txt").substr(
          segStart(col("__len"), col("__i")),
          segLen(col("__len"), col("__i")))).as("__h"))
    // probe role: for each target indexed length l and segment i, extract
    // the substrings at shifts δ with |δ| + |Δ−δ| ≤ τ (prefix edits bound
    // |δ|, suffix edits bound |Δ−δ|, and they share the τ budget):
    // δ ∈ [−⌊(τ−Δ)/2⌋, ⌊(τ+Δ)/2⌋]
    // probe only indexed lengths l ≥ m: a pair with unequal lengths is
    // caught with the LONGER doc as the indexed side (the pigeonhole
    // guarantee holds per direction), and equal-length pairs probe each
    // other symmetrically (deduped by the least/greatest normalization) —
    // halves the probe fan-out vs the full [m−τ, m+τ] band
    val probes = base
      .select(col("__id").as("__id_p"), col("__txt"), col("__len").as("__m"),
        explode(sequence(col("__len"), col("__len") + tau)).as("__l"))
      .filter(col("__l") >= k)
      .select(col("__id_p"), col("__txt"), col("__m"), col("__l"),
        explode(sequence(lit(0), lit(tau))).as("__i"))
      .withColumn("__w", segLen(col("__l"), col("__i")))
      .withColumn("__a", segStart(col("__l"), col("__i")))
      .withColumn("__delta", col("__m") - col("__l"))
      .select(col("__id_p"), col("__txt"), col("__m"), col("__l"),
        col("__i"), col("__w"),
        explode(sequence(
          col("__a") - floor((lit(tau) - col("__delta")) / 2).cast("int"),
          col("__a") + floor((lit(tau) + col("__delta")) / 2).cast("int")))
          .as("__p"))
      .filter(col("__p") >= 1 && col("__p") + col("__w") - 1 <= col("__m"))
      .select(col("__id_p"), col("__i"), col("__l"),
        xxhash64(col("__txt").substr(col("__p"), col("__w"))).as("__h"))
    val segPairs = probes.join(idx, Seq("__i", "__l", "__h"))
      .filter(col("__id_p") =!= col("__id_i"))
      .select(least(col("__id_p"), col("__id_i")).as("id_a"),
        greatest(col("__id_p"), col("__id_i")).as("id_b"))
    // short-short pairs never reach the segment path (idx needs len ≥ k),
    // so the union is disjoint; distinct collapses multi-segment matches
    segPairs.union(shortPairs).distinct()
  }

  /** Edit-distance (Levenshtein) near-dup pairs within `maxDist`:
    * partition-based CONTENT banding ([[fuzzyCandidates]] — PassJoin
    * pigeonhole, guaranteed recall) + thresholded-Levenshtein verify
    * (banded O(len·maxDist) DP with early exit, −1 above the threshold).
    *
    * Scale shape: the same band-then-verify skeleton as MinHash LSH, but
    * with provably lossless candidate generation — candidate count is
    * governed by shared content segments, not the length histogram (the
    * earlier length-only banding degenerated to all-pairs on
    * length-concentrated corpora). */
  def fuzzyPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val byId = docs.select(col(idCol).as("__id"), col(textCol).as("__txt"))
    fuzzyCandidates(docs, idCol, textCol, maxDist)
      .join(byId.withColumnsRenamed(Map("__id" -> "id_a", "__txt" -> "__ta")), "id_a")
      .join(byId.withColumnsRenamed(Map("__id" -> "id_b", "__txt" -> "__tb")), "id_b")
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  // ---- SimHash ---------------------------------------------------------

  /** Per-doc 64-bit SimHash over word tokens (single-pass token hashing). */
  def simhashOf(text: Column): Column =
    simhash64(tokenHashesOf(text))

  /** Materialized per-doc SimHash signatures (doc_id, sh). The signature
    * expression (tokenize → hash stream → bit voting) is the expensive part
    * of every SimHash pipeline; every downstream shape here self-joins, so
    * without materialization the kernel runs once per join side. Caller
    * owns the cache — `.unpersist()` when done (the d07 gate and the
    * document-level entry points below do). */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // per-row tokenize+hash signature work fused into the scan stage —
    // floor its parallelism (r21, guide §2.6; no-op at scale). The
    // simhashAllPairs verifier's O(n²) Hamming join also streams this
    // frame, so the floor parallelizes that too.
    Par.floor(docs.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"), simhashOf(col(textCol)).as("sh"))
      .persist()

  /** SimHash near-dup pairs within `maxHamming` (≤ 3 with 4 blocks) from a
    * signature frame (doc_id, sh): bucket on each of 4 16-bit blocks; any
    * pair differing in ≤3 bits agrees exactly on ≥1 block (pigeonhole), so
    * candidates collide in at least one bucket — one shuffle, no O(n²). */
  def simhashNearDupsFromSig(sig: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block banding guarantees recall only for k<=3")
    val blocked = sig.select(col("doc_id"), col("sh"),
        posexplode(array((0 until 4).map(b =>
          shiftRightUnsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .toDF("doc_id", "sh", "block", "key")
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** [[simhashNearDupsFromSig]] straight from a documents frame: signature
    * table computed and cached once, pair set materialized eagerly, cache
    * released before returning. */
  def simhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simhashTable(docs, idCol, textCol)
    try simhashNearDupsFromSig(sig, maxHamming).localCheckpoint(true)
    finally sig.unpersist()
  }

  /** Brute-force all-pairs SimHash Hamming distance from a signature frame
    * — O(n²) verifier of [[simhashNearDupsFromSig]]'s pigeonhole recall
    * guarantee (the d07 recall row asserts banded == exact with 0 missed /
    * 0 spurious). Bounded inputs only; the banded form is the scale path. */
  def simhashAllPairsFromSig(sig: DataFrame, maxHamming: Int = 3): DataFrame =
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** [[simhashAllPairsFromSig]] straight from a documents frame. */
  def simhashAllPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simhashTable(docs, idCol, textCol)
    try simhashAllPairsFromSig(sig, maxHamming).localCheckpoint(true)
    finally sig.unpersist()
  }

  // ---- near-dup cluster collapse ---------------------------------------

  /** Connected components over an undirected pair set (columns id_a, id_b)
    * via iterative min-label propagation: every node starts labeled with
    * its own id; each round, labels flow across edges and each node keeps
    * the minimum seen; fixpoint when nothing changes. Output: (id, label)
    * with label = the minimum id in the component.
    *
    * Scale notes: each round combines a neighbor-min step with a
    * pointer-doubling jump (label ← label of label, à la
    * large-star/small-star, Kiveris et al. "Connected Components in
    * MapReduce", SOCC'14), so rounds are O(log diameter): LSH near-clique
    * components converge in 1-2 rounds and a length-n chain in ~log₂(n).
    * Every round is two joins + one aggregate over the (small) pair-graph
    * node set, never touching the corpus; the driver-side loop is the
    * standard shape for iterative graph algorithms on Spark
    * (GraphX/Pregel does the same). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .persist()
    // seed with min(self, direct neighbors): one aggregation over the edge
    // list — a full propagation round for free, before the join loop starts
    var labels = edges.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .select(col("a").as("id"), col("label"))
      .persist()
    // labels are monotonically non-increasing, so Σlabel strictly decreases
    // every round until the fixpoint — one scalar aggregate per round
    // detects convergence with no comparison join (decimal sum: exact and
    // overflow-free at any id range/node count)
    // sum over an empty frame is NULL — treat as zero so an edgeless input
    // (duplicate-free corpus) converges immediately instead of NPE-ing
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("label").cast(DecimalType(38, 0)))).collect()(0)
      if (d.isNullAt(0)) java.math.BigDecimal.ZERO else d.getDecimal(0)
    }
    try {
      var prevSum = labelSum(labels)
      var iter = 0
      var done = labels.isEmpty
      while (!done && iter < maxIter) {
        val neighborMin = labels.join(edges, col("id") === col("a"))
          .select(col("b").as("id"), col("label"))
          .union(labels)
          .groupBy("id").agg(min("label").as("label"))
          .persist() // read twice below (both sides of the jump join)
        // pointer doubling: jump to the label's own label, halving the
        // remaining distance to the component minimum. localCheckpoint
        // truncates lineage — the self-join references neighborMin twice,
        // so without truncation the logical plan doubles every round and
        // plan stringification OOMs after ~10 rounds. (On a real cluster
        // prefer reliable checkpoint() with a checkpoint dir.)
        val prop = neighborMin.as("l1")
          .join(neighborMin.select(col("id").as("jid"), col("label").as("jlabel")),
            col("l1.label") === col("jid"), "left")
          .select(col("l1.id").as("id"),
            least(col("l1.label"), coalesce(col("jlabel"), col("l1.label")))
              .as("label"))
          .localCheckpoint(true)
        val s = labelSum(prop)
        neighborMin.unpersist()
        // labels is the persisted seed in round 1 and the previous round's
        // checkpoint after that; release() handles both (a checkpointed
        // frame's Dataset.unpersist() would silently leak its blocks)
        release(labels)
        labels = prop
        done = s.compareTo(prevSum) == 0
        prevSum = s
        iter += 1
      }
      if (!done) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; with " +
          "pointer doubling rounds are O(log diameter), so raise maxIter " +
          "only for pathologically chained graphs")
      // labels is localCheckpointed (lineage truncated); callers release
      // its blocks deterministically via [[release]] after consuming (the
      // pipeline endings in this object do)
      labels
    } finally {
      edges.unpersist()
    }
  }

  /** Near-duplicate clusters from MinHash-LSH pairs: one row per component
    * with its representative (min doc id), size, and member list. */
  def nearDupClusters(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, threshold)
    val labels = try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally release(pairs) // labels is checkpointed — pairs no longer needed
    // materialize the (small) cluster list eagerly so the labels blocks can
    // be released right here; the returned checkpoint is the caller's
    try labels
      .groupBy(col("label").as("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("id"))), ",").as("members"))
      .localCheckpoint(true)
    finally release(labels)
  }

  /** The pipeline ending: drop every near-duplicate except the cluster
    * representative (min id). Docs in no cluster pass through untouched —
    * one anti-join against the (tiny) loser set. */
  def dropNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, threshold)
    val labels = try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally release(pairs)
    // the loser-id set is tiny (one id per dropped duplicate) — materialize
    // it so the labels blocks release now; the anti-join stays lazy over
    // the (never-cached) corpus
    val losers = try labels
      .filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
      .localCheckpoint(true)
    finally release(labels)
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dropNearDups]] with an explicit canonical-selection policy: per
    * near-dup cluster keep the member with the HIGHEST `scoreCol`
    * (tie → min id) instead of blindly the min id — the production
    * pipeline ending where dedup keeps the best representative (longest
    * text, highest quality score, freshest crawl, ...). Same scale shape:
    * banded pairs → log-round components → tiny loser set → one anti-join
    * over the untouched corpus. */
  def keepCanonical(
      docs: DataFrame, idCol: String, textCol: String,
      scoreCol: Column, threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, threshold)
    val labels = try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally release(pairs)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("__score").desc, col("id").asc)
    val losers = try labels
      .join(docs.select(col(idCol).as("id"), scoreCol.as("__score")), "id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id").as(idCol))
      .localCheckpoint(true)
    finally release(labels)
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ---- incremental dedup against a persisted signature index ------------

  /** Greedy first-seen-wins near-dup dedup: keep doc x iff NO doc with a
    * smaller id — kept or dropped — is a near-dup of x. Unlike the
    * CC-collapse policy ([[dropNearDups]]: one representative per
    * connected component), the decision for each doc is a pure function of
    * the PAIR set, never of other docs' decisions — which is what makes it
    * incrementally maintainable: with monotone ids across batches, batch
    * N's keep/drop outcomes can never be changed by batch N+1, so
    * dedup-against-index ([[incrementalDedup]]) equals a full recompute
    * EXACTLY. (The two policies genuinely differ on bridge shapes: in a
    * chain a–b–c with a~b, b~c, a≁c, CC keeps only a; greedy keeps a and
    * c. Both are standard; greedy is what daily-snapshot pipelines run.) */
  def dropNearDupsGreedy(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, threshold)
    val losers = try pairs.select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    finally release(pairs)
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** One incremental dedup step — the operation a training-data pipeline
    * runs on each new crawl snapshot: dedup `batch` against the persisted
    * MinHash signature index at `indexPath` (and within itself, greedy
    * by id), append the batch's signatures to the index, and return the
    * kept batch rows. No recompute over the existing corpus: the index is
    * scanned once for banding keys (a pruned column scan) and only
    * candidate rows' shingle sets are joined for exact-Jaccard verify.
    *
    * The index stores (doc_id, sh, sig) for EVERY doc ever seen — dropped
    * docs included, because the greedy policy compares against all smaller
    * ids whether or not they survived (an index of survivors only would
    * let a near-dup of a dropped doc slip through; the OperatorsSpec
    * bridge test pins this). At metadata width (~1 KB/doc) that is the
    * standard cost of a crawl dedup index. Batch ids must be strictly
    * greater than every indexed id (monotone snapshots — enforced): the
    * incremental ≡ full-recompute equivalence depends on it.
    *
    * Index maintenance goes through [[Sinks.upsertSharded]]: only the
    * shard directories the batch ids hash into are rewritten; untouched
    * shards stay byte-identical (proved in SourcesSpec). */
  def incrementalDedup(
      spark: SparkSession, indexPath: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L, nShards: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // (doc_id, sh, sig) for the batch, materialized once: read by the
    // monotonicity probe, banding, both verify sides, and the index write.
    // Shingling + the 128-hash MinHash signature are the heaviest per-row
    // work in the pipeline — floor the scan-stage parallelism (r21 §2.6)
    val newSig = Par.floor(
        batch.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"),
        shingleHashes(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0) // shingle-less docs can't near-dup; not indexed
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .localCheckpoint(true)
    val hpath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldSig: Option[DataFrame] =
      if (fs.exists(hpath))
        Some(Sinks.readSharded(spark, indexPath).select("doc_id", "sh", "sig"))
      else None
    oldSig.foreach { old =>
      val maxOld = old.agg(max(col("doc_id"))).collect()(0)
      val minNew = newSig.agg(min(col("doc_id"))).collect()(0)
      require(maxOld.isNullAt(0) || minNew.isNullAt(0) ||
        maxOld.getLong(0) < minNew.getLong(0),
        "batch ids must be strictly greater than every indexed id " +
          "(monotone crawl snapshots); otherwise incremental != full recompute")
    }
    val losers = incrementalLosers(oldSig, newSig, idCol, threshold,
      bands, numHashes / bands)
    // every batch signature enters the index, losers included (see above)
    Sinks.upsertSharded(spark, indexPath,
      newSig.select(col("doc_id"), col("sh"), col("sig")), "doc_id", nShards)
    release(newSig)
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /** Core of the incremental step, shared by the sharded-index batch path
    * ([[incrementalDedup]]) and the versioned streaming path
    * ([[incrementalDedupOnce]]): candidates = banded(new)×banded(new) ∪
    * banded(old)×banded(new) (old ids are all smaller — caller-checked —
    * so the old side is always id_a and the greedy direction comes for
    * free), exact-Jaccard verify, losers = id_b at/above threshold.
    * Returned frame is eagerly checkpointed; caller releases. */
  private def incrementalLosers(
      oldSig: Option[DataFrame], newSig: DataFrame, idCol: String,
      threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val bNew = banded(newSig.select(col("doc_id"), col("sig")),
      bands, rowsPerBand)
    val newNew = bNew.as("a").join(bNew.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val cands = oldSig.map { old =>
      val bOld = banded(old.select(col("doc_id"), col("sig")),
        bands, rowsPerBand)
      bOld.as("a").join(bNew.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .unionByName(newNew)
    }.getOrElse(newNew)
      .distinct()
      .localCheckpoint(true)
    val allHashes = oldSig
      .map(_.select(col("doc_id"), col("sh"))
        .unionByName(newSig.select(col("doc_id"), col("sh"))))
      .getOrElse(newSig.select(col("doc_id"), col("sh")))
    try verifyJaccardFromHashes(allHashes, cands)
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    finally release(cands)
  }

  /** Exactly-once STREAMING variant of [[incrementalDedup]] — the
    * foreachBatch body for near-dup-suppressed corpus ingestion: dedup
    * `batch` against the signature state (and within itself), hand the
    * kept rows to `sink`, then commit the batch's signatures. The index
    * lives in [[IncrementalAgg]]'s versioned-commit state instead of the
    * sharded layout, which buys replay idempotence (a committed batchId
    * is a no-op) and one-rename atomicity — the trade is a full
    * narrow-index rewrite per batch (an object-store deployment appends
    * a file per batch instead; the batch pipeline keeps
    * [[incrementalDedup]]'s per-shard upserts).
    *
    * `sink(kept)` runs BEFORE the commit, so the at-least-once crash
    * matrix closes: crash before/inside sink → replay recomputes against
    * the unchanged previous state and overwrites identically (sinks must
    * be idempotent per batch, e.g. [[graft.streaming.EventStreams
    * .routeBinary]]-style `batch=<id>` overwrite dirs); crash after sink
    * but before commit → same; crash after commit → the whole body skips
    * (the sink output is known complete — it preceded the commit). */
  def incrementalDedupOnce(
      spark: SparkSession, statePath: String, batch: DataFrame,
      idCol: String, textCol: String, batchId: Long,
      sink: DataFrame => Unit, threshold: Double = 0.8,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import graft.operators.IncrementalAgg
    if (!IncrementalAgg.latestVersion(spark, statePath).forall(_ < batchId))
      return
    val newSig = Par.floor(
        batch.select(col(idCol).as("doc_id"), col(textCol)), "doc_id")
      .select(col("doc_id"),
        shingleHashes(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .localCheckpoint(true)
    val oldSig: Option[DataFrame] =
      IncrementalAgg.latestVersion(spark, statePath)
        .map(_ => IncrementalAgg.readState(spark, statePath))
    oldSig.foreach { old =>
      val maxOld = old.agg(max(col("doc_id"))).collect()(0)
      val minNew = newSig.agg(min(col("doc_id"))).collect()(0)
      require(maxOld.isNullAt(0) || minNew.isNullAt(0) ||
        maxOld.getLong(0) < minNew.getLong(0),
        "batch ids must be strictly greater than every indexed id " +
          "(monotone ingestion); otherwise incremental != full recompute")
    }
    try {
      val losers = incrementalLosers(oldSig, newSig, idCol, threshold,
        bands, numHashes / bands)
      try sink(batch.join(losers, Seq(idCol), "left_anti"))
      finally release(losers)
      // a sink failure skips the commit: the replay recomputes against
      // the unchanged previous state and overwrites the sink output
      IncrementalAgg.refreshOnceWith(spark, statePath,
        newSig.select(col("doc_id"), col("sh"), col("sig")), batchId,
        (st, dl) => st.unionByName(dl))
    } finally release(newSig)
  }

  /** The end-to-end dedup cascade — the production pipeline ending a
    * training-data run actually executes: exact dedup FIRST (one cheap
    * hash-shuffle on an 8-byte digest), then MinHash-LSH near-dup
    * clustering + canonical keep-best over the survivors.
    *
    * Exact-first is the mitigation for LSH candidate blowup on clone-heavy
    * corpora (measured in the 10× scale smoke: every clone family is a
    * near-dup clique, so candidates grow quadratically in family size —
    * removing exact copies before banding collapses that to genuine
    * near-dups). It also catches exact dups the LSH stage structurally
    * cannot see: docs with fewer than `shingleN` tokens have no shingles,
    * never enter banding, and identical copies of them survive
    * [[keepCanonical]] — but not the exact stage.
    *
    * Stage order is safe for canonicality when exact copies tie on the
    * score (they do for any content-derived score): the exact stage's
    * min-id pick is exactly the canonical tie-break. */
  def cascade(
      docs: DataFrame, idCol: String, textCol: String,
      scoreCol: Column, threshold: Double = 0.8): DataFrame =
    // eager checkpoint between the stages: keepCanonical's LSH pipeline
    // consumes its input from several branches (signature build, pair
    // verify, survivor anti-join), and without the cut each branch re-runs
    // the exact stage's digest shuffle
    keepCanonical(exactDedup(docs, idCol, textCol).localCheckpoint(true),
      idCol, textCol, scoreCol, threshold)

  /** Exact-first fuzzy dedup — [[cascade]]'s mitigation applied to the
    * edit-distance path: exact copies collapse on one digest shuffle
    * BEFORE PassJoin segment banding, so each distinct text enters the
    * probe/index joins once (the 10× smoke's full-corpus d27 row is
    * output-bound on dist-0 clone cliques — 45 pairs per 10-clone family —
    * and this stage removes every one of them). Survivors then drop
    * greedily by id ([[dropNearDupsGreedy]]'s policy: drop x iff some
    * smaller-id survivor is within `maxDist`) — a pure function of the
    * pair set, which keeps the whole composition SQL-replicable and so
    * hash-exact under the oracle, unlike the hash-family cascades. */
  def dropFuzzyNearDupsCascade(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val reps = exactDedup(docs, idCol, textCol)
    val losers = fuzzyPairs(reps, idCol, textCol, maxDist)
      .select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    reps.join(losers, Seq(idCol), "left_anti")
  }

  // ---- embedding near-dup ----------------------------------------------

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * via banded sign-random-projection LSH (same banding amplification as
    * MinHash): each vector gets `bands` keys from
    * [[graft.functions.SrpBandKeys]]; pairs sharing any (band, key) become
    * candidates — one shuffle on an 8-byte key, O(candidates) — and exact
    * cosine verification keeps precision at 1. Recall at the default
    * 12×12 banding is ≈ 0.98 at cosine 0.95 and → 1 as cosine → 1 (true
    * near-dups); see [[embeddingNearDupsExact]] for the all-pairs recall
    * verifier. */
  def embeddingNearDups(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 12, bitsPerBand: Int = 12,
      seed: Long = 42L): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v")).persist()
    try {
      val keyed = e.select(col("vec_id"),
          posexplode(srpBandKeys(col("v"), bands, bitsPerBand, seed)))
        .toDF("vec_id", "band", "key")
      val cands = keyed.as("a").join(keyed.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
      cands
        .join(e.withColumnsRenamed(Map("vec_id" -> "id_a", "v" -> "v_a")), "id_a")
        .join(e.withColumnsRenamed(Map("vec_id" -> "id_b", "v" -> "v_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          cosineF32(col("v_a"), col("v_b")).as("cosine"))
        .filter(col("cosine") >= threshold)
        .localCheckpoint(true) // small verified pair set; frees the vector cache
    } finally e.unpersist()
  }

  /** Embedding-side cluster collapse, symmetric with [[dropNearDups]]:
    * SRP-banded cosine pairs → connected components → drop everything but
    * each cluster's min-id representative. */
  def dropEmbeddingNearDups(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95): DataFrame = {
    val pairs = embeddingNearDups(emb, idCol, vecCol, threshold)
    val labels = try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally release(pairs)
    val losers = try labels
      .filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
      .localCheckpoint(true)
    finally release(labels)
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup scoped
    * to k-means clusters — candidate pairs are searched only WITHIN a
    * cluster, so the pair space is Σ|cell|² ≈ n²/k instead of n², and each
    * cell's self-join is an equi-join on cell_id (one shuffle, no
    * broadcastable side needed). `cents` is a trained (cell_id, centroid)
    * codebook ([[Similarity.kmeansCentroids]]) — at 100 TB it is trained
    * once offline on a sample and reused, exactly like the IVF coarse
    * quantizer it is shared with (e06/e10). Pairs carry the EXACT cosine
    * (computed within-cell), so precision is 1 by construction; the only
    * approximation is recall — a cross-cluster near-dup pair is missed,
    * the measured tradeoff the e11 gate row tracks. */
  def semDedupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, tau: Double): DataFrame = {
    // row-local assignment over the driver-held codebook (the kmeansRound
    // serving kernel) — no corpus×k crossJoin, no per-row window shuffle
    val assigned = Similarity.withNearestCell(
        // nearest-cell assignment is per-row k-means serving work fused
        // into the scan stage — floor its parallelism (r21, guide §2.6);
        // the checkpointed frame's partitioning then feeds both join sides
        Par.floor(emb.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
          "vec_id"),
        "v", Similarity.collectCents(cents))
      .select(col("cell_id"), col("vec_id"), col("v"))
      .localCheckpoint(true) // assign once; both join sides read the block
    try {
      assigned.as("a").join(assigned.as("b"),
          col("a.cell_id") === col("b.cell_id") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          cosineF32(col("a.v"), col("b.v")).as("cosine"))
        .filter(col("cosine") >= tau)
        .localCheckpoint(true)
    } finally release(assigned)
  }

  /** SemDeDup pipeline ending: corpus minus every non-representative
    * member of each within-cluster near-dup component (min-id keeps,
    * same policy as [[dropEmbeddingNearDups]]). */
  def semDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, tau: Double): DataFrame =
    semDedupFromPairs(emb, idCol,
      semDedupPairs(emb, idCol, vecCol, cents, tau), releasePairs = true)

  /** [[semDedup]] ending over an already-computed pair set — lets a caller
    * that also inspects the pairs (the e11 gate) run the assignment and
    * pair join once. `releasePairs=true` hands pair-block ownership here. */
  def semDedupFromPairs(
      emb: DataFrame, idCol: String, pairs: DataFrame,
      releasePairs: Boolean = false): DataFrame = {
    val labels =
      try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally if (releasePairs) release(pairs)
    val losers = try labels
      .filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
      .localCheckpoint(true)
    finally release(labels)
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** Brute-force all-pairs cosine — O(n²) small-data oracle path and
    * test-time recall verifier for [[embeddingNearDups]]. */
  def embeddingNearDupsExact(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // O(n²) pair cosines ride the streamed side of the nested-loop join —
    // floor its scan parallelism (r21, guide §2.6; no-op at scale)
    val e = Par.floor(
      emb.select(col(idCol).as("vec_id"), col(vecCol).as("v")), "vec_id")
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosineF32(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---- attribution ----------------------------------------------------

  /** Per-source exact-duplication ATTRIBUTION — the governance report a
    * corpus release publishes next to its dedup step (Dolma/RedPajama
    * style): for every source, how many of its docs are surplus COPIES
    * (their payload's keeper — global min id — is some other doc), and
    * how many of those copies duplicate content whose keeper lives in a
    * DIFFERENT source (cross-source syndication, the mirror/scrape
    * signal). Output: (source, n_docs, n_dup_copies,
    * n_cross_source_copies).
    *
    * Scale shape: one row-local digest projection (md5 so any engine —
    * or a release manifest — reproduces it; null payloads digest as ''
    * per the null-total rule, so no row silently drops from its source's
    * accounting), a map-side-combinable MIN-struct keeper aggregate per
    * digest, one digest-keyed join back, and a source-sized final
    * aggregate. Text never shuffles — digests and ids only. */
  def dedupAttribution(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val sig = docs.select(col(sourceCol).as("source"),
      col(idCol).as("doc_id"), md5(coalesce(col(textCol), lit(""))).as("dg"))
    val keep = sig.groupBy(col("dg"))
      .agg(min(struct(col("doc_id"), col("source"))).as("__k"))
    sig.join(keep, Seq("dg"))
      .select(col("source"),
        (col("doc_id") === col("__k.doc_id")).as("__is_keeper"),
        (col("source") =!= col("__k.source")).as("__cross"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("__is_keeper"), 1L).otherwise(0L)).as("n_dup_copies"),
        sum(when(!col("__is_keeper") && col("__cross"), 1L).otherwise(0L))
          .as("n_cross_source_copies"))
  }

  /** Per-source NEAR-duplication attribution — [[dedupAttribution]]'s
    * governance report extended from exact copies to near-dup CLUSTERS
    * (real syndication reports count lightly-edited mirrors, not just
    * byte copies): MinHash near-dup pairs ([[minhashNearDups]], exact-
    * Jaccard-verified), connected components, every unclustered doc its
    * own singleton, and the cluster KEEPER is the canonical by
    * (`scoreCol` DESC, id ASC) — [[keepCanonical]]'s rule, so the report
    * attributes copies to the member a canonical dedup would keep, not
    * blindly to the min id. Output per source: total docs, surplus
    * near-dup copies (keeper is some other doc), and copies whose keeper
    * lives in a DIFFERENT source (the cross-source syndication signal).
    *
    * Scale shape: text shuffles only as shingle digests (the d06
    * machinery); components run on the verified pair set (pairs-sized,
    * O(log d) rounds); the keeper is a map-side-combinable MAX-struct per
    * label ((score, −id, source) — lexicographic, id unique so the source
    * field never decides); everything after is id/label-keyed. */
  def nearDupAttribution(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      scoreCol: Column, threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(docs, idCol, textCol, threshold)
    val labels = try connectedComponents(pairs.select(col("id_a"), col("id_b")))
      finally release(pairs)
    try {
      val lab = docs
        .select(col(idCol).as("id"), col(sourceCol).as("source"),
          scoreCol.as("__score"))
        .join(labels, Seq("id"), "left")
        .withColumn("label", coalesce(col("label"), col("id")))
      val keep = lab.groupBy(col("label"))
        .agg(max(struct(col("__score"), (-col("id")).as("nid"),
          col("source"))).as("__k"))
        .select(col("label"), (-col("__k.nid")).as("__kid"),
          col("__k.source").as("__ksource"))
      // the rollup is source-cardinality-sized — materialize it before
      // releasing the label blocks it is computed from
      lab.join(keep, Seq("label"))
        .select(col("source"),
          (col("id") === col("__kid")).as("__is_keeper"),
          (col("source") =!= col("__ksource")).as("__cross"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("__is_keeper"), 1L).otherwise(0L)).as("n_dup_copies"),
          sum(when(!col("__is_keeper") && col("__cross"), 1L).otherwise(0L))
            .as("n_cross_source_copies"))
        .localCheckpoint(true)
    } finally release(labels)
  }

  // ---- substring-level dedup (duplicate-span removal) ------------------

  /** Position packing for the canonical-occurrence encoding in
    * [[dupSpanRemoval]]: occurrences order as (doc_id, pos) via the single
    * long doc_id·2²⁰ + pos, so the canonical pick is a plain `min` with
    * map-side partial aggregation (no struct ordering shipped through the
    * shuffle, and the DuckDB oracle reproduces the arithmetic exactly).
    * Bounds: pos < 2²⁰ (a one-million-token document) and doc_id ∈
    * [0, 2⁴³) — ENFORCED with a raise (the streamingRetention posture):
    * an out-of-range id or position would silently corrupt
    * canonical-occurrence selection via encoding collisions. */
  private val PosBase = 1L << 20
  private val DocIdBound = 1L << 43

  /** Exact duplicate-SUBSTRING removal — the span-level dedup that
    * doc-level dedup cannot express (two documents sharing a boilerplate
    * paragraph are NOT duplicates, but the paragraph is): every length-`l`
    * token window that occurs more than once corpus-wide is removed from
    * every occurrence EXCEPT the canonical one (globally smallest
    * (doc_id, pos)), and each document is reassembled from its surviving
    * tokens. Overlapping duplicated windows merge naturally because
    * removal is token-coverage, not span splicing.
    *
    * Shape: one row-local window pass (the single-pass word-n-gram kernel,
    * then md5 so the shuffle key is a fixed 32-byte digest, never the
    * window text), ONE aggregation keyed on the digest (count + min — both
    * partial-aggregating, so a boilerplate shared by millions of documents
    * arrives at its reducer as per-partition partials, not a hot key's raw
    * occurrence list), one join of occurrences against the (much smaller,
    * duplicated-keys-only) table — AQE broadcasts it when the duplication
    * rate is low, the common corpus case — and one doc-keyed aggregation
    * of the marked starts. The reassembly is row-local: a position filter
    * against the doc's marked starts (O(tokens · marked starts per doc);
    * marked starts are bounded by the doc's own duplicated windows).
    *
    * Returns (doc_id, n_tokens, n_dup_windows, n_removed, cleaned_text),
    * one row per input document (docs with fewer than `l` tokens pass
    * through unmarked). Tokenization is [[TextAnalysis.tokens]] (the
    * oracle-shared lowercase whitespace split). */
  def dupSpanRemoval(
      docs: DataFrame, idCol: String, textCol: String, l: Int): DataFrame = {
    require(l >= 1, s"window length must be positive, got $l")
    val did = col(idCol).cast("long")
    val base = docs.select(
      when(did < 0 || did >= DocIdBound,
        raise_error(concat(lit("dupSpanRemoval: doc_id "), did,
          lit(s" outside [0, $DocIdBound) — the doc_id*2^20+pos " +
            "canonical encoding would collide"))).cast("long"))
        .otherwise(did).as("doc_id"),
      col(textCol).as("text"))
    def enc = col("doc_id") * PosBase + col("pos")
    val occ = base.select(col("doc_id"),
        posexplode(TextAnalysis.ngrams(col("text"), l)).as(Seq("pos", "win")))
      .select(col("doc_id"),
        when(col("pos") >= PosBase,
          raise_error(concat(lit("dupSpanRemoval: token position "),
            col("pos"), lit(s" >= $PosBase — a document beyond the " +
              "one-million-token encoding bound; split it upstream")))
            .cast("long"))
          .otherwise(col("pos").cast("long")).as("pos"),
        md5(col("win")).as("wkey"))
    val dup = occ.groupBy(col("wkey"))
      .agg(count(lit(1)).as("cnt"), min(enc).as("canon"))
      .filter(col("cnt") > 1)
      .select(col("wkey"), col("canon"))
    val marks = occ.join(dup, Seq("wkey"))
      .filter(enc =!= col("canon"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("starts"),
        count(lit(1)).as("n_dup_windows"))
    val tk = toks(col("text"))
    val n = size(tk).cast("long")
    val starts = coalesce(col("starts"), array().cast("array<long>"))
    val kept = filter(
      when(n > 0, sequence(lit(0L), n - 1L))
        .otherwise(array().cast("array<long>")),
      i => !exists(starts, p => p <= i && i < p + l))
    base.join(marks, Seq("doc_id"), "left")
      .select(col("doc_id"), n.as("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        (n - size(kept)).as("n_removed"),
        concat_ws(" ",
          transform(kept, i => element_at(tk, (i + 1L).cast("int"))))
          .as("cleaned_text"))
  }

  // ---- snapshot diff --------------------------------------------------

  /** Dataset-versioning diff: classify every id across two corpus
    * snapshots as added / removed / changed / unchanged by comparing
    * content digests. The join moves (id, 16-byte digest) only — at
    * 100 TB comparing two releases costs two narrow digest scans plus one
    * id-keyed shuffle of ~24 B/row, never the text itself. md5 rather
    * than xxhash64 so any engine (and any release manifest written by
    * another system) reproduces the digest byte-for-byte. */
  def snapshotDiff(
      v1: DataFrame, v2: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    // presence is a flag, NOT digest-nullness: a row whose payload is NULL
    // (md5 → null) must still count as present on its side
    val a = v1.select(col(idCol), md5(col(payloadCol)).as("__h1"),
      lit(true).as("__in1"))
    val b = v2.select(col(idCol), md5(col(payloadCol)).as("__h2"),
      lit(true).as("__in2"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in1").isNull, lit("added"))
          .when(col("__in2").isNull, lit("removed"))
          .when(!(col("__h1") <=> col("__h2")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
