package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Both operators key
  * off md5 of the stringified row id instead of `rand()`: the sample is a
  * pure function of the data, so it is reproducible across runs, engines,
  * partitionings, and cluster sizes — and therefore oracle-checkable
  * (DuckDB computes the identical md5 hex). `rand(seed)`-based sampling is
  * none of those: Spark seeds per partition, so the kept set changes with
  * the partition layout.
  */
object Sampling {

  /** First hex digit (lowercase) of md5 of the stringified id — a uniform
    * 16-bucket hash of the row identity. */
  private def hexDigit(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1)

  /** Deterministic Bernoulli sample keeping `sixteenths`/16 of the rows:
    * a row survives iff its [[hexDigit]] sorts below the cutoff character.
    * Pure narrow filter — no shuffle, evaluated in the scan stage, and the
    * selectivity is honored by AQE downstream. Rate granularity of 1/16 is
    * the trade-off for the single-character comparison being identical in
    * every engine; chain on a later md5 character for finer rates. */
  def bernoulliSample(df: DataFrame, idCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16, "rate is sixteenths/16")
    // index 16 = 'g' sorts above every hex digit → keep all
    val cutoff = "0123456789abcdefg".charAt(sixteenths).toString
    df.filter(hexDigit(col(idCol)) < lit(cutoff))
  }

  /** Token-budget mixture sampling: within each stratum (e.g. source or
    * language, with the budget derived from mixture weights), take rows in
    * hash-priority order until the stratum's running token count reaches
    * `budget`. A row is kept iff the tokens BEFORE it are under budget, so
    * each stratum overshoots by at most one document and is never empty
    * while it has data — the standard way training mixtures specified in
    * tokens get materialized.
    *
    * Scale note: the running sum is a window per stratum — unlike
    * [[quotaSample]]'s rank ≤ k there is no map-side group-limit for a
    * cumulative-sum cut, so each stratum sorts on one reducer. For
    * web-scale strata, pre-trim with [[bernoulliSample]] to a superset
    * calibrated from per-stratum token totals (any rate whose expected
    * token mass safely covers `budget`), then budget-sample the superset —
    * hash-priority order is preserved under subsetting, so the result is
    * identical whenever the superset covers the budget. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, stratumCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") - col(tokenCol) < budget)
  }

  /** Fixed-size per-stratum sample: within each stratum, rank rows by
    * (md5(id), id) — a deterministic uniform-random order — and keep the
    * first `quota`. The `row_number <= k` shape compiles to Spark's
    * WindowGroupLimit: each map task pre-trims to k rows per stratum before
    * the shuffle, so the exchange moves O(partitions × k) rows per stratum,
    * not the whole stratum — the property that keeps a 10-stratum sample of
    * a 100 TB corpus from sorting 10 TB per stratum on one reducer.
    * Output keeps all input columns plus `sample_rank` (1-based). */
  def quotaSample(
      df: DataFrame, idCol: String, stratumCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }

  /** Temperature-weighted domain mixture sample — the α-smoothed
    * multinomial rebalancing used to mix training-corpus domains (small
    * domains upweighted relative to their share: weight ∝ n^α, α < 1; the
    * CCNet/XLM-R-style mix). Each domain gets keep-rate
    * min(1, targetFrac·N·w_d / (W·n_d)) and rows survive a deterministic
    * per-row hash test at that rate, so the sample is a pure function of
    * the data (reproducible across runs/engines/partitionings, same as
    * [[bernoulliSample]]).
    *
    * Scale shape: one tiny per-domain aggregate (broadcast back), then a
    * NARROW filter in the scan stage — nothing about the corpus itself
    * ever shuffles. Determinism details that make it oracle-exact:
    * weights quantize to fixed-point ([×10⁶] longs) so the weight total
    * is an exact integer sum (order-independent); α = 0.5 uses `sqrt`,
    * which IEEE 754 requires correctly rounded — bit-identical in every
    * engine (other α go through `pow`, whose last ulp is libm-specific:
    * fine in production, not under a cross-engine hash gate); the rate
    * comparison tests a 52-bit md5 prefix against rate·2⁵² in exact
    * double arithmetic. */
  def temperatureMix(
      df: DataFrame, idCol: String, domainCol: String,
      targetFrac: Double, alpha: Double = 0.5): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0, 1]")
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val nd = col("__n").cast("double")
    val smoothed = if (alpha == 0.5) sqrt(nd) else pow(nd, alpha)
    val stats = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(smoothed * lit(1e6)).cast("long"))
    // alias the derived frames: totals shares stats' lineage, so bare
    // col("...") refs would be ambiguous after the joins
    val totals = stats
      .agg(sum(col("__n")).as("__N"), sum(col("__w")).as("__W")).as("__t")
    val rate = least(lit(1.0),
      (lit(targetFrac) * col("__t.__N").cast("double") *
        col("__s.__w").cast("double")) /
        (col("__t.__W").cast("double") * col("__s.__n").cast("double")))
    val h52 = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    df.join(broadcast(stats.as("__s")), col(domainCol) === col("__s.__dom"))
      .join(broadcast(totals))
      .filter(h52 < rate * lit(4503599627370496.0)) // 2^52
      .drop("__dom", "__n", "__w", "__N", "__W")
  }

  /** Largest-remainder (Hamilton) apportionment of a row budget across
    * domains — the integer allocation step of an EXPLICIT target mixture
    * (the Pile/Dolma recipe: "X% web, Y% code, Z% books", vs
    * [[temperatureMix]]'s availability-derived smoothing). Each domain's
    * quota is `floor(budget·w/W)` plus one of the `budget − Σfloor`
    * leftovers, handed out by largest remainder (ties → domain order),
    * then CAPPED at availability. Pure integer algebra — bit-exact in any
    * engine. The cap can make the total land under budget; a production
    * system iterates the apportionment over the uncapped domains —
    * documented single-pass here, so the gate stays closed-form.
    *
    * `stats` is one row per domain `(domainCol, n_avail)` — bounded by
    * domain cardinality, so the single-partition ranking window is over a
    * driver-safe row count by construction. */
  def mixtureAllocate(
      stats: DataFrame, domainCol: String, weightCol: Column,
      budget: Long): DataFrame =
    hamiltonAllocate(stats, domainCol, weightCol, budget,
      capAtAvailability = true)

  /** [[mixtureAllocate]] WITHOUT the availability cap — the allocation
    * the epoch-upsampling recipe needs: a scarce domain's target may
    * exceed its pool (alloc > n_avail means the domain REPEATS —
    * epochs > 1), so Σ alloc = budget always holds exactly. */
  def epochAllocate(
      stats: DataFrame, domainCol: String, weightCol: Column,
      budget: Long): DataFrame =
    hamiltonAllocate(stats, domainCol, weightCol, budget,
      capAtAvailability = false)

  private def hamiltonAllocate(
      stats: DataFrame, domainCol: String, weightCol: Column,
      budget: Long, capAtAvailability: Boolean): DataFrame = {
    require(budget > 0, "budget must be positive")
    // weights quantize to ×10⁶ fixed point (the temperatureMix contract)
    // BEFORE the long cast: Hamilton is scale-invariant — floor(B·kw/kW)
    // = floor(B·w/W) and remainders scale by k, preserving quotients and
    // tie-break order exactly — so integer weights allocate identically
    // while fractional weights (0.5, 2.7) stop silently truncating to 0.
    // An all-zero weight total still fails loudly (ANSI DIVIDE_BY_ZERO),
    // and a POSITIVE weight below the 1e-6 quantum fails loudly too
    // (raise_error) instead of silently starving its domain.
    val wq0 = (weightCol * lit(1000000L)).cast("long")
    val wq = when(weightCol > lit(0) && wq0 === lit(0L),
        raise_error(concat(lit("hamiltonAllocate: positive weight "),
          weightCol.cast("string"),
          lit(" quantizes to zero at the 1e-6 fixed-point quantum — " +
            "rescale the weight column"))).cast("long"))
      .otherwise(wq0)
    // alias the derived frames: tot shares stats' lineage (the
    // temperatureMix self-join disambiguation pattern)
    val w = stats.withColumn("__w", wq).as("__s")
    val tot = stats.withColumn("__w", wq)
      .agg(sum(col("__w")).as("__W")).as("__t")
    // budget·__w rides DECIMAL(38,0): two longs multiply to ≤ 8.5e37 —
    // always in range — so huge budget × weight products can neither
    // overflow (ANSI abort) nor corrupt quotients/remainders. Quotients
    // are identical to long arithmetic wherever that didn't overflow.
    val prod = (lit(budget).cast("decimal(38,0)") * col("__s.__w"))
    val remRank = Window.orderBy(
      (prod % col("__t.__W")).desc,
      col(domainCol).asc)
    val raw = col("__base") +
      when(col("__rank") <= col("__leftover"), 1L).otherwise(0L)
    w.crossJoin(broadcast(tot))
      .withColumn("__base", org.apache.spark.sql.functions
        .expr(s"CAST($budget AS DECIMAL(38,0)) * __s.__w div __t.__W"))
      .withColumn("__leftover",
        lit(budget) - sum(col("__base")).over(Window.partitionBy()))
      .withColumn("__rank", row_number().over(remRank))
      .withColumn("alloc",
        if (capAtAvailability) least(col("n_avail"), raw) else raw)
      .select(col(domainCol), col("n_avail"), col("alloc"))
  }

  /** Epoch-upsampled mixture materialization — the LLaMA-style data
    * recipe realized as rows (Touvron et al. 2023 list epochs per source:
    * scarce high-value domains repeat — Wikipedia 2.45 epochs, Books
    * 2.23 — while the web crawl is subsampled): apportion the row budget
    * by weight WITHOUT the availability cap ([[epochAllocate]]), then
    * each domain materializes `alloc div n_avail` FULL passes over all
    * its rows plus a partial pass of its first `alloc mod n_avail` rows
    * in the deterministic (md5(id), id) hash-priority order — so
    * Σ output = budget exactly, every copy carries a 0-based `epoch`
    * index (downstream epoch-aware shuffles — d42 — interleave on it),
    * and a domain's copies are maximally balanced (row multiplicities
    * within a domain differ by at most 1).
    *
    * Scale shape: one tiny per-domain aggregate, the Hamilton table as a
    * broadcast join, ONE rank window over the corpus keyed by domain
    * (every row may repeat, so no pre-filter applies — this is the one
    * unavoidable shuffle), then a row-local sequence-explode that emits
    * each row's copies without ever re-scanning. Pure integer + md5
    * algebra — engine-exact. */
  def epochMaterialize(
      df: DataFrame, idCol: String, domainCol: String, weightCol: Column,
      budget: Long): DataFrame = {
    val stats = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_avail"))
    val alloc = epochAllocate(stats, domainCol, weightCol, budget)
      .withColumn("__full", expr("alloc div n_avail"))
      .withColumn("__part", col("alloc") % col("n_avail"))
      .select(col(domainCol), col("__full"), col("__part"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .join(broadcast(alloc), Seq(domainCol))
      .withColumn("__copies", col("__full") +
        when(col("sample_rank") <= col("__part"), 1L).otherwise(0L))
      .withColumn("epoch", explode(when(col("__copies") > 0,
        sequence(lit(0L), col("__copies") - 1))
        .otherwise(array().cast("array<long>"))))
      .drop("__full", "__part", "__copies")
  }

  /** Materialize an explicit target mixture: apportion `budget` rows
    * across domains by `weightCol` ([[mixtureAllocate]]) and keep each
    * domain's quota in the deterministic (md5(id), id) hash-priority
    * order ([[quotaSample]]'s contract). The global `row_number ≤
    * max(alloc)` pre-filter is a LITERAL bound, so the window still
    * compiles to WindowGroupLimit (map-side trim before the shuffle);
    * the exact per-domain cut is the subsequent broadcast-join filter.
    * Output keeps all input columns plus `sample_rank`. */
  def mixtureMaterialize(
      df: DataFrame, idCol: String, domainCol: String, weightCol: Column,
      budget: Long): DataFrame = {
    val stats = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_avail"))
    val alloc = mixtureAllocate(stats, domainCol, weightCol, budget)
    val maxAlloc = alloc.agg(max(col("alloc"))).head.getLong(0)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= lit(maxAlloc))
      .join(broadcast(alloc.select(col(domainCol), col("alloc"))),
        Seq(domainCol))
      .filter(col("sample_rank") <= col("alloc"))
      .drop("alloc")
  }

  /** QUALITY-WEIGHTED mixture — the learned-curation tier composed into
    * the mixture recipe: instead of hand weights, each domain's Hamilton
    * weight is its MEASURED mean quality (`scoreCol`, any per-doc score in
    * [0,1] — d02/d11's heuristic score, d51's classifier probability,
    * 1−normalized d53 perplexity), so the apportionment upweights domains
    * the scorer likes at equal availability. Weight = the fixed-point
    * integer `floor(Σ floor(score·10⁶)) div n` (a ×10⁶ floor-quantized
    * mean): integer algebra end-to-end, so with an engine-replicable
    * score the whole allocation is hash-exact. A domain whose every doc
    * scores < 10⁻⁶ weighs 0 and allocates 0 (documented semantics — a
    * zero-quality domain earns nothing; Hamilton's loud guard covers the
    * positive-weight-quantizes-to-0 case).
    *
    * Scale shape: ONE corpus scan folds into the domain-cardinality stats
    * frame (count + integer score sum — map-side combinable); the frame is
    * localCheckpoint'd so the Hamilton pass and the weight join-back reuse
    * it instead of re-scanning; everything after is domain-sized. Output:
    * (domainCol, n_avail, w_q, alloc). */
  def qualityWeightedAllocate(
      docs: DataFrame, domainCol: String, scoreCol: Column,
      budget: Long): DataFrame = {
    val stats = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_avail"),
        sum(floor(scoreCol * 1000000).cast("long")).as("__sq"))
      .withColumn("w_q", call_function("div", col("__sq"), col("n_avail")))
      .localCheckpoint(true)
    try {
      mixtureAllocate(stats, domainCol, col("w_q"), budget)
        .join(stats.select(col(domainCol), col("w_q")), Seq(domainCol))
        .select(col(domainCol), col("n_avail"), col("w_q"), col("alloc"))
        .localCheckpoint(true)
    } finally Dedup.release(stats)
  }

  /** CURRICULUM ordering (Bengio et al. 2009) — the easy-first training
    * order: every doc gets a contiguous global `curriculum_pos`, sorted
    * by quantized quality DESCENDING (highest-quality = easiest first,
    * the standard web-corpus proxy) with deterministic (md5(id), id)
    * shuffling WITHIN each quality level — so equal-quality docs arrive
    * hash-shuffled, not id-ordered (the within-level shuffle every
    * curriculum implementation needs to avoid accidental ordering bias).
    *
    * Scale shape: [[GlobalOrder.withGlobalRowNumber]]'s two-pass range
    * partition — no single-reducer sort. Fixed-point score quantization
    * (×10⁴ floor) makes level membership and therefore the whole order
    * engine-exact with a replicable score. Output: input columns plus
    * (score_q, curriculum_pos). */
  def curriculumOrder(
      docs: DataFrame, idCol: String, scoreCol: Column): DataFrame = {
    val keyed = docs
      .withColumn("score_q", floor(scoreCol * 10000).cast("long"))
      .withColumn("__lvl", -col("score_q"))
      .withColumn("__k", md5(col(idCol).cast("string")))
    GlobalOrder.withGlobalRowNumber(keyed, Seq("__lvl", "__k", idCol))
      .withColumnRenamed("global_rn", "curriculum_pos")
      .drop("__lvl", "__k")
  }

  /** CURRICULUM × EPOCH composition — the LLaMA-style recipe realized as
    * one global training order: [[curriculumOrder]] sequences a single
    * pass, but an epoch-upsampled mixture ([[epochMaterialize]]) trains
    * SEVERAL passes, and the standard composition is EPOCH-MAJOR
    * (epochs stay contiguous — pass k finishes before pass k+1 starts),
    * easy-first WITHIN each epoch (quantized quality DESC), and a
    * PER-EPOCH reshuffle within each quality level — the shuffle key is
    * md5(epoch ':' id), so equal-quality docs arrive in a different
    * deterministic order every pass (re-presenting an epoch in the same
    * order is the classic ordering-bias the per-epoch reshuffle
    * removes; d42's epoch-salted key, applied within levels).
    *
    * Input rows carry `epochCol` (0-based pass index — one row per
    * copy, [[epochMaterialize]]'s output shape). Scale shape:
    * [[GlobalOrder.withGlobalRowNumber]]'s two-pass range partition over
    * (epoch, level, salted hash, id) — no single-reducer sort; pure
    * integer + md5 algebra, engine-exact with a replicable score.
    * Output: input columns plus (score_q, curriculum_pos). */
  def curriculumEpochOrder(
      docs: DataFrame, idCol: String, epochCol: String,
      scoreCol: Column): DataFrame = {
    val keyed = docs
      .withColumn("score_q", floor(scoreCol * 10000).cast("long"))
      .withColumn("__lvl", -col("score_q"))
      .withColumn("__k",
        md5(concat_ws(":", col(epochCol).cast("string"),
          col(idCol).cast("string"))))
    GlobalOrder.withGlobalRowNumber(keyed,
        Seq(epochCol, "__lvl", "__k", idCol))
      .withColumnRenamed("global_rn", "curriculum_pos")
      .drop("__lvl", "__k")
  }

  /** Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    * priority keys: each row draws `priority = u^(1/w)` from a
    * deterministic per-row uniform `u`, and the global top-k by priority
    * IS a weighted sample without replacement (a weight-2w row is ~2×
    * likelier to make the cut than a weight-w one). This is the
    * one-pass, mergeable form of weighted reservoir sampling — the tool
    * for "oversample the scarce languages / domains k rows total"
    * without first materializing per-domain pools.
    *
    * Determinism contract (the reason this sits under a cross-engine
    * hash gate): `u` is an exact 32-bit md5 prefix over 2³² (both exact
    * doubles), and weights are restricted to powers of two {1, 2, 4, 8}
    * so the root is an ITERATED `sqrt` — IEEE 754 requires sqrt
    * correctly rounded, so the priority is bit-identical in every
    * engine, exactly like [[temperatureMix]]'s α = 0.5 contract
    * (arbitrary weights go through `pow`, whose last ulp is
    * libm-specific: fine in production, not under the gate).
    *
    * Scale shape: the priority is a NARROW per-row expression in the
    * scan stage; top-k plans as TakeOrderedAndProject (per-partition
    * heaps + one k-row merge), never a global sort. */
  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every source
    * document by how target-like its hashed-unigram distribution is —
    * log w(x) = Σ_words [log p̂_T(b(w)) − log p̂_S(b(w))] under a
    * product-of-unigrams model over `buckets` hash buckets — and keep the
    * highest-weight slice. The practical curation move when you have a
    * small high-quality TARGET corpus (textbooks, wiki) and a huge raw
    * SOURCE pool.
    *
    * Scale shape: two bucket-count aggregates (target and source — key
    * space = `buckets`, corpus-independent, map-side combinable), the
    * smoothed log-ratio table collected (≤ buckets doubles — the
    * driver-held-artifact pattern) and broadcast; per-doc scoring rides
    * the row-local [[graft.functions.WordCounts]] histogram (per-(doc,
    * distinct word) rows, the d48 shape), one broadcast join, one per-doc
    * sum. Returns (idCol, dsir_score) for every source doc; selection is
    * the caller's ORDER BY score LIMIT k (map-side top-k). Bucket hash =
    * first 8 md5 hex digits mod buckets — engine-replicable (the d13
    * sampling recipe), though gates use the recall-row pattern since the
    * float log-sum is partition-order sensitive.
    *
    * `lengthNormalize` (default true) scores the MEAN per-token log
    * ratio instead of the raw sum. The raw likelihood-ratio sum is
    * length-dominated on mixed-length corpora: any systematic per-token
    * offset between the two vocabulary distributions (even the dilution
    * introduced by the target's own distinctive tokens) multiplies by
    * document length and buries the distinctive-token signal — measured
    * on the planted d52 corpus, raw-sum scores correlate −0.9995 with
    * doc length; normalized scores rank by target affinity. */
  def dsirScores(
      source: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, alpha: Double = 1.0,
      lengthNormalize: Boolean = true): DataFrame = {
    require(buckets > 0 && alpha > 0)
    val spark = source.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.wordCountsOf
    def bucketOf(w: Column): Column =
      pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(buckets))
    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = df.select(explode(wordCountsOf(col(textCol))).as("e"))
        .groupBy(bucketOf(col("e.g")).as("b"))
        .agg(sum(col("e.c")).as("c"))
        .collect()
      val arr = Array.fill(buckets)(0L)
      rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val t = bucketCounts(target)
    val s = bucketCounts(source)
    val tTot = t.sum + alpha * buckets
    val sTot = s.sum + alpha * buckets
    // smoothed per-bucket log ratio, broadcast as ONE array literal —
    // element_at is a codegen'd O(1) lookup per (doc, word) row
    val logRatio: Array[Double] = Array.tabulate(buckets) { b =>
      math.log((t(b) + alpha) / tTot) - math.log((s(b) + alpha) / sTot)
    }
    // explode_outer: a token-less doc (null/empty text) keeps one row with
    // a null entry, so every source doc gets a score instead of silently
    // vanishing from the output. The pinned score is -Inf — "no tokens,
    // no evidence of target affinity" — so ORDER BY score DESC LIMIT k
    // selection can never pick one (0.0 would rank them ABOVE real docs
    // on corpora where even affine text nets a negative mean log ratio)
    val perDoc = source
      .select(col(idCol), explode_outer(wordCountsOf(col(textCol))).as("e"))
      .select(col(idCol), col("e.c").as("c"),
        (col("e.c") * element_at(typedLit(logRatio),
          (bucketOf(col("e.g")) + 1).cast("int"))).as("contrib"))
      .groupBy(col(idCol))
    if (lengthNormalize)
      perDoc.agg(coalesce(sum(col("contrib")) / sum(col("c")),
        lit(Double.NegativeInfinity)).as("dsir_score"))
    else
      perDoc.agg(coalesce(sum(col("contrib")),
        lit(Double.NegativeInfinity)).as("dsir_score"))
  }

  /** CCNet-style perplexity filtering score: per-doc cross-entropy under
    * a hashed-unigram language model of the corpus itself — −mean
    * log p̂(bucket(w)) per token. CCNet ranks Common-Crawl docs by LM
    * perplexity and drops the worst tail (gibberish, boilerplate,
    * non-language bytes); a product-of-unigrams model over hash buckets
    * is the engine-friendly degenerate case with the identical serving
    * shape to a real KenLM pass (per-doc mean token logprob). Same
    * machinery as [[dsirScores]]: ONE bucket-count aggregate
    * (corpus-independent key space), the smoothed logprob table broadcast
    * as an array literal, per-doc scores over the row-local word
    * histogram with one per-doc sum. Higher = more surprising = worse.
    * Gates use the recall-row pattern (float log means). */
  def unigramCrossEntropy(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0)
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.wordCountsOf
    def bucketOf(w: Column): Column =
      pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(buckets))
    val rows = docs.select(explode(wordCountsOf(col(textCol))).as("e"))
      .groupBy(bucketOf(col("e.g")).as("b"))
      .agg(sum(col("e.c")).as("c"))
      .collect()
    val cnt = Array.fill(buckets)(0L)
    rows.foreach(r => cnt(r.getLong(0).toInt) = r.getLong(1))
    val tot = cnt.sum + alpha * buckets
    val negLogP: Array[Double] =
      Array.tabulate(buckets)(b => -math.log((cnt(b) + alpha) / tot))
    // explode_outer + coalesce: token-less docs score +Inf explicitly
    // (higher = worse — a doc with no tokens is maximal gibberish for a
    // perplexity FILTER and must never pass it) instead of vanishing —
    // see dsirScores for the explode_outer rationale
    docs.select(col(idCol), explode_outer(wordCountsOf(col(textCol))).as("e"))
      .select(col(idCol), col("e.c").as("c"),
        (col("e.c") * element_at(typedLit(negLogP),
          (bucketOf(col("e.g")) + 1).cast("int"))).as("contrib"))
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("contrib")) / sum(col("c")),
        lit(Double.PositiveInfinity)).as("cross_entropy"))
  }

  def weightedPrioritySample(
      df: DataFrame, idCol: String, weightCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0) // 2^32
    val priority = when(weightCol === 1, u)
      .when(weightCol === 2, sqrt(u))
      .when(weightCol === 4, sqrt(sqrt(u)))
      .when(weightCol === 8, sqrt(sqrt(sqrt(u))))
      // fail fast instead of silently null-sorting an invalid weight out
      // of every sample
      .otherwise(raise_error(concat(
        lit("weightedPrioritySample: weight must be one of {1, 2, 4, 8}, got "),
        weightCol.cast("string"))))
    df.withColumn("weight", weightCol)
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("priority").desc, col(idCol))))
  }
}
