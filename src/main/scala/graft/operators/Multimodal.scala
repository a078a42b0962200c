package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extract / resize / frame-sample as partition-local batch
  * transforms.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape, null handling. The actual media decode is STUBBED (this
  * environment has no image/audio codecs): `decodeStub` derives
  * deterministic fake pixels/samples from the payload bytes. Swapping in a
  * real decoder (JavaCPP/ffmpeg on executors, or a Python `mapInPandas`
  * stage in a PySpark deployment) changes only the function body marked
  * STUB below — every plan around it is production-shaped.
  */
object Multimodal {

  /** Typed row for media assets: payload plus self-describing metadata.
    * At 100 TB the payloads dominate; keep them in their own column so
    * metadata-only queries prune the scan down to the small columns. */
  case class MediaAsset(
      asset_id: Long,
      modality: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int,   // image/video
      sample_rate: Int,          // audio
      n_frames: Int)             // video/audio frames

  case class MediaFeatures(
      asset_id: Long,
      modality: String,
      byte_len: Int,
      // decoded-feature vector (deterministic stub; fixed length)
      features: Array[Float],
      // resize/frame-sample bookkeeping
      out_width: Int, out_height: Int, sampled_frames: Int)

  /** Build a synthetic media-asset frame from the documents table:
    * payload = utf-8 bytes of the text (stand-in for a real blob column).
    * Demonstrates the binary-column schema without external data. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + lit(16)).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + lit(16)).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(30)) + lit(1)).cast("int").as("n_frames"))
      .as[MediaAsset]
  }

  /** STUB decoder: deterministic pseudo-decode of payload bytes into a
    * fixed-length feature vector. A real deployment replaces ONLY this
    * function with an actual codec call. */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) {
      h = graft.functions.Mix.fmix64(h ^ payload(i))
      out(i % dim) += ((h & 0xffff) / 65535.0f) - 0.5f
      i += 1
    }
    out
  }

  /** 64-bit perceptual hash of a decoded feature vector: bit i = sign of
    * feature i — the DCT-sign construction real pHash uses, here over the
    * stub decode (the Spark-side plumbing is real; the codec is the
    * documented stub). Identical payloads give identical hashes;
    * independent payloads' stub features carry ~iid signs, so unrelated
    * assets sit ~32±4 bits apart — far outside any banded search radius.
    * Folded MSB-first (shift-and-or — bitwise, so the top bit lands in
    * the sign without tripping ANSI overflow) — no variable shift
    * needed, stable 64-bit key. */
  def perceptualHash64(features: Column): Column =
    aggregate(
      sequence(lit(63), lit(0), lit(-1)),
      lit(0L),
      (acc, i) => shiftleft(acc, 1).bitwiseOR(
        when(element_at(features, (i + 1).cast("int")) > 0f, 1L)
          .otherwise(0L)))

  /** CLIP-score-style image–text pair filtering — the LAION curation gate
    * (Schuhmann et al. 2021 keep a crawled (image, caption) pair only when
    * CLIP cosine ≥ 0.28; every large image-text dataset since runs the
    * same shape). The encoders are the documented STUB (this environment
    * has no vision model): the payload decodes as UTF-8 and both sides
    * embed via a signed hashed bag-of-words (feature hashing, Weinberger
    * et al. 2009) over `buckets` md5 buckets — bucket = first-8-hex-digits
    * mod buckets (the d13/d52 recipe), sign = parity of the 9th hex digit,
    * value = signed token count. A real deployment swaps ONLY the
    * embedding columns for model outputs; the pair plumbing, scoring, and
    * threshold gate are production-shaped.
    *
    * Engine-parity: embeddings are INTEGER vectors, so dot and
    * squared-norms are exact in any engine (order-independent integer
    * sums); cosine = dot / (sqrt(ss_i)·sqrt(ss_c)) uses only
    * correctly-rounded IEEE ops and is floor-quantized to 1e-4 BEFORE the
    * threshold (the e19/e21 contract), so the keep set is hash-exact.
    * Disjoint vocabularies give expected-zero cosine (signs cancel) —
    * mismatched captions score near 0, aligned captions near 1.
    *
    * Scale shape: entirely ROW-LOCAL — one [[graft.functions.WordCounts]]
    * histogram per side, bucket/sign mapping via transform, dot/norms as
    * nested in-array folds (O(|vocab_i|·|vocab_c|) per row on ~31-entry
    * arrays); no Exchange, no Join, payloads never shuffle. At 100 TB the
    * gate is scan-bound, which is how LAION actually ran it. */
  /** Signed hashed bag-of-words embedding (feature hashing, Weinberger et
    * al. 2009) as a sparse (bucket, value) struct array — bucket =
    * first-8-hex-digits of md5 mod `buckets` (the d13/d52 recipe), sign =
    * parity of the 9th hex digit, value = signed word count. INTEGER
    * values ⇒ dot/norms exact in any engine. Shared by [[clipScorePairs]]
    * and [[Similarity.chunkRetrieveTopK]]. */
  private[operators] def hashedBowOf(text: Column, buckets: Int): Column = {
    require(buckets > 0)
    import graft.functions.GraftFunctions.wordCountsOf
    def bucketOf(w: Column): Column =
      pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(buckets))
    def signOf(w: Column): Column =
      when(pmod(conv(substring(md5(w), 9, 1), 16, 10).cast("long"),
        lit(2)) === 0, 1L).otherwise(-1L)
    transform(wordCountsOf(text), e => struct(
      bucketOf(e.getField("g")).as("b"),
      (signOf(e.getField("g")) * e.getField("c")).as("v")))
  }

  /** [[hashedBowOf]] densified to a fixed `buckets`-long bigint vector
    * (per-bucket signed sums) — the layout pair joins want, so the
    * per-pair dot is the codegen'd `dot_i64` kernel instead of a
    * CodegenFallback nested fold (the measured 10×+ on e26's
    * chunks × queries crossJoin). Densification is ONE row-local
    * aggregate whose input is the sparse array itself (a single
    * reference — the accumulator-array fold sidesteps the HOF
    * re-inlining trap where a per-bucket transform would re-evaluate
    * the md5 mapping `buckets` times per row). */
  private[operators] def denseBowOf(text: Column, buckets: Int): Column =
    aggregate(hashedBowOf(text, buckets),
      array_repeat(lit(0L), buckets),
      (acc, e) => transform(acc, (x, i) =>
        when(i === e.getField("b").cast("int"), x + e.getField("v"))
          .otherwise(x)))

  /** Σ_b (Σ_{w∈b} v_a)(Σ_{w∈b} v_b) as a nested fold over the two
    * MATERIALIZED sparse arrays (bounded quadratic per row — vocab-sized,
    * the intended inner loop, not the HOF re-inlining trap). */
  private[operators] def sparseDot(a: Column, b: Column): Column =
    aggregate(a, lit(0L), (acc, x) =>
      acc + x.getField("v") * aggregate(b, lit(0L), (a2, y) =>
        a2 + when(y.getField("b") === x.getField("b"), y.getField("v"))
          .otherwise(0L)))

  def clipScorePairs(
      pairs: DataFrame, idCol: String, payloadCol: String,
      captionCol: String, buckets: Int = 64,
      threshold: Double = 0.8): DataFrame = {
    require(buckets > 0)
    def mapped(text: Column): Column = hashedBowOf(text, buckets)
    def dotOf(a: Column, b: Column): Column = sparseDot(a, b)
    // a null payload or caption must still produce a full scored row
    // (rejected at cos 0 with zero norms, not null-flagged): embed the
    // empty string — WordCounts gives the empty histogram, every fold 0
    pairs
      .withColumn("__img",
        mapped(coalesce(decode(col(payloadCol), "UTF-8"), lit(""))))
      .withColumn("__cap", mapped(coalesce(col(captionCol), lit(""))))
      .withColumn("dot", dotOf(col("__img"), col("__cap")))
      .withColumn("img_ss", dotOf(col("__img"), col("__img")))
      .withColumn("cap_ss", dotOf(col("__cap"), col("__cap")))
      .withColumn("clip_cos",
        when(col("img_ss") > 0 && col("cap_ss") > 0,
          floor(col("dot").cast("double") /
            (sqrt(col("img_ss").cast("double")) *
              sqrt(col("cap_ss").cast("double"))) * 10000) / 10000)
          .otherwise(lit(0.0)))
      .withColumn("keep", col("clip_cos") >= lit(threshold))
      .select(col(idCol), col("dot"), col("img_ss"), col("cap_ss"),
        col("clip_cos"), col("keep"))
  }

  /** Decode + feature-extract, partition-local with batch shape:
    * the Scala analogue of `mapInPandas` — each partition is processed as a
    * stream of rows with no driver involvement, so it scales linearly with
    * executors. `targetWidth/Height` and `frameStride` model resize /
    * frame-sampling parameters. */
  def extractFeatures(
      assets: Dataset[MediaAsset],
      dim: Int = 64,
      targetWidth: Int = 224, targetHeight: Int = 224,
      frameStride: Int = 5): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feats = decodeStub(a.payload, dim) // STUB: real codec goes here
        MediaFeatures(
          asset_id = a.asset_id,
          modality = a.modality,
          byte_len = a.payload.length,
          features = feats,
          out_width = if (a.modality == "audio") 0 else targetWidth,
          out_height = if (a.modality == "audio") 0 else targetHeight,
          sampled_frames =
            if (a.modality == "video") math.max(1, a.n_frames / frameStride)
            else if (a.modality == "audio") a.n_frames
            else 1)
      }
    }
  }

  /** End-to-end demo pipeline used by tests and SparkEntry: documents →
    * assets → features → per-modality stats. Deterministic. */
  def modalityStats(docs: DataFrame): DataFrame = {
    val feats = extractFeatures(assetsFromDocuments(docs))
    feats.toDF().groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("asset_id")).as("min_id"),
        max(col("sampled_frames")).as("max_sampled_frames"))
      .orderBy(col("modality"))
  }

  // ---- content-defined chunking (CDC) dedup --------------------------

  /** Content-defined chunk table: split each payload at CONTENT anchors —
    * a boundary falls after every token whose md5 starts with '0'
    * (expected chunk ≈ 16 tokens; widen/narrow the hex prefix to tune) —
    * so an insertion reshapes only the chunk it lands in, and every chunk
    * after the next anchor is byte-identical to before. That shift
    * resilience is what fixed-size blocks can't give and is the whole
    * point of rsync/restic/LBFS-style blob dedup. Here the unit is the
    * token stream of the text payload (portable: md5 per token replicates
    * in any engine); the byte-level Gear-hash variant replaces only the
    * boundary predicate, at the same codec seam as [[decodeStub]].
    *
    * Scale shape: one narrow pass builds (doc, chunk_idx, chunk); the
    * dedup shuffle moves 16-byte chunk digests, never payloads. Output:
    * (doc_id, chunk_idx, chunk_hash, chunk_chars). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val tokTable = docs
      .select(col(idCol), posexplode(toks).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withChunk = tokTable.withColumn("chunk_idx",
      coalesce(sum(when(substring(md5(col("tok")), 1, 1) === "0", 1L)
        .otherwise(0L)).over(w), lit(0L)))
    withChunk
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .as("__ordered"))
      .select(col(idCol), col("chunk_idx"),
        array_join(transform(col("__ordered"), s => s.getField("tok")), " ")
          .as("chunk"))
      .select(col(idCol), col("chunk_idx"),
        md5(col("chunk")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("chunk_chars"))
  }
  /** Corpus-level CDC dedup accounting: chunks stored once per distinct
    * content. `savings_chars` is what a chunk-addressed blob store saves
    * vs storing every payload whole. */
  def cdcDedupStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // every output is derivable from the distinct-chunk frame (chunk_chars
    // is identical per hash), so the corpus-wide chunking pipeline runs
    // ONCE: n_chunks = Σ refs, total_chars = Σ chars·refs
    val distinctChunks = cdcChunks(docs, idCol, textCol)
      .groupBy(col("chunk_hash"))
      .agg(min(col("chunk_chars")).as("chars"), count(lit(1)).as("refs"))
    distinctChunks.agg(
        sum(col("refs")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("chars") * col("refs")).as("total_chars"),
        sum(col("chars")).as("stored_chars"),
        (sum(col("chars") * col("refs")) - sum(col("chars")))
          .as("savings_chars"),
        coalesce(sum(when(col("refs") > 1, col("refs"))), lit(0L))
          .as("shared_refs"))
  }
}
