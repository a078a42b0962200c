package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.functions._

/** Registration + Column DSL for graft's custom Catalyst functions.
  *
  * Functions are injected into the session's FunctionRegistry (the same
  * mechanism `SparkSessionExtensions.injectFunction` uses) and surfaced as
  * `Column`s via `call_function`, which keeps us on the public Column API
  * while still executing native expressions — no UDF serialization anywhere.
  *
  * Mirrors + extends the reference registry
  * (spear-core/src/main/scala/spear/FunctionRegistry.scala:38-64).
  */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }
  private def longLit(e: Expression, name: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name expects a long literal, got $other")
  }

  private def strLit(e: Expression, name: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a string literal, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "product" -> (es => ProductAgg(Cast(es.head, DoubleType))),
    "dot_f32" -> (es => DotProductF32(es(0), es(1))),
    "cosine_f32" -> (es => CosineSimF32(es(0), es(1))),
    "l2norm_f32" -> (es => L2NormF32(es.head)),
    "minhash_signature" -> (es => MinHashSignature(
      es(0), intLit(es(1), "minhash_signature.k"),
      longLit(es(2), "minhash_signature.seed"))),
    "simhash64" -> (es => SimHash64(es.head)),
    "shingle_hashes" -> (es => ShingleHashes(es(0), intLit(es(1), "shingle_hashes.n"))),
    "token_hashes" -> (es => TokenHashes(es.head)),
    "word_ngrams" -> (es => WordNGrams(es(0), intLit(es(1), "word_ngrams.n"))),
    "char_ngrams" -> (es => CharNGrams(es(0), intLit(es(1), "char_ngrams.n"))),
    "char_ngram_counts" -> (es =>
      CharNGramCounts(es(0), intLit(es(1), "char_ngram_counts.n"))),
    "word_counts" -> (es => WordCounts(es.head)),
    "value_counts" -> (es => ValueCounts(es.head)),
    "dot_i8" -> (es => DotProductI8(es(0), es(1))),
    "normsq_i8" -> (es => NormSqI8(es.head)),
    "dot_i64" -> (es => DotProductI64(es(0), es(1))),
    "hamming64" -> (es => Hamming64(es(0), es(1))),
    "band_keys64" -> (es => BandKeys64(es(0), intLit(es(1), "band_keys64.bands"))),
    "srp_band_keys" -> (es => SrpBandKeys(
      es(0), intLit(es(1), "srp_band_keys.bands"),
      intLit(es(2), "srp_band_keys.bitsPerBand"),
      longLit(es(3), "srp_band_keys.seed"))),
    // Spark ships these Bloom expressions for its own runtime row-group
    // filtering but leaves them out of the public registry; surfacing them
    // gives pipelines membership prefilters (decontamination id lists,
    // join pruning) as fixed-size mergeable aggregate state
    "bloom_agg" -> (es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2))),
    "bloom_might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))),
    // DataSketches-backed mergeable sketches (see SketchAggs.scala): fixed
    // size map-side state whose serialized form can be stored per partition
    // and unioned later — the q98 HLL pattern for quantiles / heavy hitters
    "kll_agg" -> (es => KllSketchAgg(es.head)),
    "kll_merge_agg" -> (es => KllMergeAgg(es.head)),
    // accept any numeric literal: SQL `0.5` parses as a Decimal, the
    // Column DSL passes a Double
    "kll_quantile" -> (es => KllQuantile(es(0), es(1) match {
      case Literal(v: Double, _) => v
      case Literal(v: Float, _) => v.toDouble
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case Literal(v: Int, _) => v.toDouble
      case Literal(v: Long, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_quantile expects a numeric literal rank, got $other")
    })),
    "freq_agg" -> (es => FreqItemsAgg(es(0), intLit(es(1), "freq_agg.maxMapSize"))),
    "freq_merge_agg" -> (es => FreqMergeAgg(es(0), intLit(es(1), "freq_merge_agg.maxMapSize"))),
    "freq_items" -> (es => FreqItemRows(es.head)),
    "freq_max_error" -> (es => FreqMaxError(es.head)),
    "theta_agg" -> (es => ThetaSketchAgg(es(0), intLit(es(1), "theta_agg.lgK"))),
    "theta_setop" -> (es => ThetaSetOpSummary(es(0), es(1), strLit(es(2), "theta_setop.op"))),
    // Unicode normalization kernels (TextNormalize.scala) — codegen'd
    "normalize_text" -> (es => NormalizeText(es(0), strLit(es(1), "normalize_text.form"))),
    "strip_accents" -> (es => StripAccents(es.head))
  )

  /** Idempotent: register all graft functions in this session. */
  def register(spark: SparkSession): SparkSession = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
    }
    spark
  }

  /** The same builders via the `spark.sql.extensions` entry point
    * ([[graft.GraftExtensions]]): injected functions materialize in every
    * session the extended cluster creates. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }

  // ---- Column DSL ----------------------------------------------------

  def product(c: Column): Column = call_function("product", c)
  def dotF32(a: Column, b: Column): Column = call_function("dot_f32", a, b)
  def cosineF32(a: Column, b: Column): Column = call_function("cosine_f32", a, b)
  def l2normF32(a: Column): Column = call_function("l2norm_f32", a)
  def minhashSignature(hashes: Column, k: Int, seed: Long): Column =
    call_function("minhash_signature", hashes, lit(k), lit(seed))
  def simhash64(tokenHashes: Column): Column = call_function("simhash64", tokenHashes)
  def shingleHashesOf(text: Column, n: Int): Column =
    call_function("shingle_hashes", text, lit(n))
  def tokenHashesOf(text: Column): Column = call_function("token_hashes", text)
  def wordNgramsOf(text: Column, n: Int): Column =
    call_function("word_ngrams", text, lit(n))
  def charNgramsOf(text: Column, n: Int): Column =
    call_function("char_ngrams", text, lit(n))
  def charNgramCountsOf(text: Column, n: Int): Column =
    call_function("char_ngram_counts", text, lit(n))
  def wordCountsOf(text: Column): Column = call_function("word_counts", text)
  def valueCountsOf(arr: Column): Column = call_function("value_counts", arr)
  def dotI8(a: Column, b: Column): Column = call_function("dot_i8", a, b)
  def normSqI8(a: Column): Column = call_function("normsq_i8", a)
  def dotI64(a: Column, b: Column): Column = call_function("dot_i64", a, b)
  def hamming64(a: Column, b: Column): Column = call_function("hamming64", a, b)
  def bandKeys64(sig: Column, bands: Int): Column =
    call_function("band_keys64", sig, lit(bands))
  def srpBandKeys(vec: Column, bands: Int, bitsPerBand: Int, seed: Long): Column =
    call_function("srp_band_keys", vec, lit(bands), lit(bitsPerBand), lit(seed))
  /** Bloom filter over a LONG column (hash keys first, e.g. xxhash64). */
  def bloomAgg(keys: Column, expectedItems: Long, numBits: Long): Column =
    call_function("bloom_agg", keys, lit(expectedItems), lit(numBits))
  def bloomMightContain(bloom: Column, key: Column): Column =
    call_function("bloom_might_contain", bloom, key)
  /** KLL quantile sketch over a DOUBLE column → serialized sketch. */
  def kllAgg(values: Column): Column = call_function("kll_agg", values)
  /** Union serialized KLL sketches → serialized sketch. */
  def kllMergeAgg(sketches: Column): Column = call_function("kll_merge_agg", sketches)
  /** Rank-q quantile estimate from a serialized KLL sketch. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    call_function("kll_quantile", sketch, lit(rank))
  /** Frequent-items (Misra-Gries) sketch over a STRING column. */
  def freqAgg(terms: Column, maxMapSize: Int): Column =
    call_function("freq_agg", terms, lit(maxMapSize))
  /** Union serialized frequent-items sketches. */
  def freqMergeAgg(sketches: Column, maxMapSize: Int): Column =
    call_function("freq_merge_agg", sketches, lit(maxMapSize))
  /** NO_FALSE_NEGATIVES report: array<struct<term, est, lb, ub>>. */
  def freqItems(sketch: Column): Column = call_function("freq_items", sketch)
  /** A-priori error bound of a frequent-items sketch. */
  def freqMaxError(sketch: Column): Column = call_function("freq_max_error", sketch)
  /** Theta sketch over a LONG column → serialized compact sketch. */
  def thetaAgg(keys: Column, lgK: Int): Column =
    call_function("theta_agg", keys, lit(lgK))
  /** Set operation on two serialized Theta sketches → struct<est, lb, ub>
    * (bounds at 3σ; exact mode ⇒ lb = est = ub). */
  def thetaSetOp(a: Column, b: Column, op: String): Column =
    call_function("theta_setop", a, b, lit(op))
  /** Unicode normalization: form ∈ NFC | NFD | NFKC | NFKD. */
  def normalizeText(s: Column, form: String): Column =
    call_function("normalize_text", s, lit(form))
  /** Remove combining diacritical marks (NFD → drop Mn → NFC). */
  def stripAccents(s: Column): Column = call_function("strip_accents", s)

  // ---- Reference-semantics shims (SURVEY §2.7 deltas) ------------------

  /** Reference `first`/`last` default to ignoreNulls=true
    * (spear aggregates/basic.scala:38-108); Spark defaults to false. */
  def firstValue(c: Column): Column = first(c, ignoreNulls = true)
  def lastValue(c: Column): Column = last(c, ignoreNulls = true)

  /** Reference `a || b` Concat skips NULLs
    * (spear stringExpressions.scala:17-18); Spark concat is null-strict. */
  def concatSkipNulls(cols: Column*): Column = concat_ws("", cols: _*)

  /** Reference RLike is a full match (`matcher.matches()`,
    * spear stringExpressions.scala:24-37); Spark rlike substring-finds. */
  def rlikeFull(c: Column, pattern: String): Column =
    c.rlike("^(?:" + pattern + ")$")

  /** Reference `/` on integrals is integer division
    * (spear arithmetics.scala:58-70); Spark `/` always returns double. */
  def intDiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Reference array_agg collects NULLs too (spear aggregates/basic
    * .scala:110-126); Spark collect_list drops them. Wrapping each element
    * in a struct (never null) preserves them, then unwrap. */
  def arrayAggWithNulls(c: Column): Column =
    transform(collect_list(struct(c.as("v"))), s => s.getField("v"))

  /** Reference string→boolean cast words (spear Cast.scala:129-146):
    * lowercase then {yes,y,true,t,on} → true, {no,n,false,f,off} → false,
    * NULL stays NULL, anything else is an error (spear TypeCastException;
    * Spark's own cast would return "1"→true / unknown→NULL instead). */
  def stringToBooleanRef(c: Column): Column = {
    val l = lower(c)
    when(l.isin(booleanTrueStrings: _*), lit(true))
      .when(l.isin(booleanFalseStrings: _*), lit(false))
      .when(c.isNull, lit(null).cast("boolean"))
      .otherwise(raise_error(
        concat(lit("Can't cast string ["), c, lit("] to boolean"))).cast("boolean"))
  }

  private val booleanTrueStrings = Seq("yes", "y", "true", "t", "on")
  private val booleanFalseStrings = Seq("no", "n", "false", "f", "off")

  /** Reference implicit integral→boolean cast is C-style truthiness
    * (spear Cast.scala:74-80, `_ != 0`); Spark only casts 0/1 patterns. */
  def numberToBooleanRef(c: Column): Column = c =!= 0

  /** Reference And/Or are null-STRICT (`nullSafeEvaluate`: NULL if either
    * operand is NULL — spear logicalOperators.scala:15-28 with
    * Expression.scala:345-353), not SQL three-valued logic where
    * `NULL AND false = false` / `NULL OR true = true`. The facade keeps
    * Spark's SQL-correct Kleene logic by default (SURVEY §2.7 decision);
    * these shims reproduce the reference exactly for migrating users. */
  def andStrict(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("boolean")).otherwise(a && b)
  def orStrict(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("boolean")).otherwise(a || b)
}
