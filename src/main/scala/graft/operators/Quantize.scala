package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for vector corpora: symmetric int8 quantization
  * with exact integer error accounting. At 100 TB an fp32 embedding column
  * is often the widest thing in the table; int8 cuts it 4× and most ANN
  * stacks tolerate the precision loss — but only if the pipeline can
  * MEASURE that loss. The error metric here is an order-independent
  * integer (a sum of floor-quantized per-element ticks), so it is exactly
  * reproducible across engines, partitionings, and reruns — unlike a
  * float L2 norm, whose accumulation order changes the last bits.
  *
  * Everything composes codegen'd higher-order builtins (`transform` /
  * `zip_with` / `aggregate`) over the array column — no UDF boxing, stays
  * inside WholeStageCodegen, scan prunes to (id, vec).
  *
  * Determinism note (the reason every step is floor/multiply/divide):
  * IEEE-754 ×, ÷ are correctly rounded in both the JVM and any C++
  * engine, so `x/absmax*127` evaluated in this exact order is
  * bit-identical everywhere; `floor` then lands on the same integer. A
  * `round()`-based quantizer would straddle half-even vs half-up on
  * boundary values.
  */
object Quantize {

  /** Per-vector quantization stats:
    * `absmax_q`  — floor(max |x| · 10⁴), the scale in ticks;
    * `q_l1`      — Σ |q_i| of the int8 codes (a checksum of the codes);
    * `err_ticks` — Σ floor(|x_i − q_i·absmax/127| · 10⁴), integer
    *               reconstruction error.
    * Codes are `floor(x/absmax·127)` ∈ [−127, 127]. */
  def int8Stats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val absmax = array_max(transform(v, x => abs(x)))
    val q = transform(v, x => floor(x / absmax * lit(127.0)))
    emb.select(
      col(idCol),
      v.as("__v"), absmax.as("__absmax"), q.as("__q"))
      .select(
        col(idCol),
        floor(col("__absmax") * 10000).cast("long").as("absmax_q"),
        aggregate(col("__q"), lit(0L),
          (acc, x) => acc + abs(x).cast("long")).as("q_l1"),
        aggregate(
          zip_with(col("__v"), col("__q"), (x, qi) =>
            floor(abs(x - qi * col("__absmax") / lit(127.0)) * 10000)),
          lit(0L), (acc, e) => acc + e.cast("long")).as("err_ticks"))
  }

  /** The int8 codes themselves (for writing a compacted table): array of
    * small ints plus the per-vector scale needed to dequantize. */
  def int8Codes(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val absmax = array_max(transform(v, x => abs(x)))
    emb.select(
      col(idCol),
      absmax.as("scale"),
      transform(v, x => floor(x / absmax * lit(127.0)).cast("tinyint"))
        .as("codes"))
  }

  /** The deterministic ±1 Johnson–Lindenstrauss sign matrix: entry (j, i)
    * is +1 iff the first 8 hex chars of md5("j:i") parse to an even
    * integer — a pure function any engine reproduces, no RNG state. */
  def jlSign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss dimensionality reduction with a ±1 sign matrix:
    * `reduced_j = (Σ_i sign(j,i) · v_i) / √k`. The JL lemma bounds pairwise
    * distance distortion at O(√(log n / k)), which is what makes a reduced
    * table the cheap FIRST tier of vector serving — brute-force/IVF scans
    * read k doubles per row instead of d, with e01-style re-ranking on the
    * full vectors for the shortlist (the same two-tier shape as e10's ADC).
    *
    * Scale + determinism: the k×d matrix is a pure md5 function baked into
    * the projection expression at plan time (driver-computed literals —
    * ~k·d signs, no per-row hashing), so the projection is a NARROW
    * codegen'd map on the scan with no shuffle. Each output coordinate is
    * a fixed left-to-right sum of exact float→double products divided by
    * the correctly-rounded √k — bit-identical in any engine that sums the
    * same list order (the e01 cosine-parity contract). Output is long
    * format (id, j, r) so callers can pivot or re-assemble arrays. */
  def randomProjection(
      emb: DataFrame, idCol: String, vecCol: String,
      sourceDim: Int, targetDim: Int): DataFrame =
    randomProjectionVec(emb, idCol, vecCol, sourceDim, targetDim)
      .select(col(idCol), posexplode(col("rvec")))
      .select(col(idCol), col("pos").as("j"), col("col").as("r"))

  /** [[randomProjection]] keeping the reduced vector as one array column —
    * the shape the tiered kNN serving path consumes. */
  def randomProjectionVec(
      emb: DataFrame, idCol: String, vecCol: String,
      sourceDim: Int, targetDim: Int): DataFrame = {
    require(targetDim > 0 && sourceDim >= targetDim)
    val invSqrtK = 1.0 / math.sqrt(targetDim.toDouble)
    // one zip_with/aggregate HOF per output dim over a LITERAL sign row —
    // compiled loops over the array. The unrolled d-term expression tree
    // (k·d element_at + multiplies) blows past the codegen method-size
    // limit and silently falls back to interpreted eval (measured ~3×
    // slower at d=64, k=16). aggregate folds left in index order, so the
    // cross-engine sum-order contract is unchanged.
    val reduced = (0 until targetDim).map { j =>
      val signs = typedLit((0 until sourceDim).map(i => jlSign(j, i)).toArray)
      aggregate(
        zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, e) => acc + e) * lit(invSqrtK)
    }
    emb.select(col(idCol), array(reduced: _*).as("rvec"))
  }
}
