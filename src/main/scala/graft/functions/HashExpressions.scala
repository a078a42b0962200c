package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object Mix {
  /** MurmurHash3 64-bit finalizer (public-domain mixing constants).
    * Full-avalanche bijective mixer used to derive the MinHash permutation
    * family and SimHash bit spreading. */
  @inline final def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }
}

/** `minhash_signature(shingleHashes, k, seed)` → array<bigint> of length k.
  *
  * One pass over the input array computing all k permutation minima
  * (h_i(x) = fmix64(x ^ seed_i)), instead of k separate `aggregate()` calls —
  * O(len * k) multiply-free mixing, no allocation beyond the result array.
  * Empty/size-0 input yields Long.MaxValue entries (never matches a real
  * signature band). Used by the MinHash-LSH near-duplicate operator
  * (graft.operators.Dedup); semantics follow the standard Broder MinHash
  * construction.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0, "numHashes must be positive")

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val seeds: Array[Long] = {
    val a = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = Mix.fmix64(seed + 0x9e3779b97f4a7c15L * (i + 1))
      i += 1
    }
    a
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val m = Mix.fmix64(h ^ seeds(i))
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `shingle_hashes(text, n)` → array<bigint>: distinct 64-bit hashes of the
  * word n-gram shingles of `text` (lowercased, whitespace-tokenized, empty
  * tokens dropped — the same token stream as
  * `filter(split(lower(text), "\\s+"), t => t != "")`).
  *
  * Why an expression and not built-in HOFs: the compositional form
  * `transform(sequence(...), i => concat_ws(" ", element_at(toks, i), ...))`
  * re-inlines and re-evaluates the tokenizer tree at every `element_at`
  * reference — O(tokens²) work per document (measured 5 ms/doc on ~350-char
  * docs). This single pass is O(chars + tokens·n) with no intermediate
  * shingle strings, which is what you want when the corpus is 100 TB.
  *
  * Hash values are internal (Jaccard on hash sets == Jaccard on string
  * shingle sets up to ~n²/2⁶⁴ collision probability); only set semantics
  * are observable.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "shingle size must be positive")

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.toString
    // tokenize: lowercase, split on whitespace runs, drop empties
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) tokens += text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    }
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
    // 64-bit token hashes (FNV-ish polynomial + fmix finalizer)
    val th = new Array[Long](tokens.length)
    var t = 0
    while (t < tokens.length) {
      val s = tokens(t)
      var h = 0xcbf29ce484222325L
      var c = 0
      while (c < s.length) { h = (h ^ s.charAt(c)) * 0x100000001b3L; c += 1 }
      th(t) = Mix.fmix64(h)
      t += 1
    }
    // order-sensitive n-gram combine, distinct via sort+unique
    val m = tokens.length - n + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = th(j)
      var k = 1
      while (k < n) { h = Mix.fmix64(h ^ (th(j + k) * 0x9e3779b97f4a7c15L)); k += 1 }
      out(j) = h
      j += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 1
    var p = 1
    while (p < m) { if (out(p) != out(p - 1)) { out(uniq) = out(p); uniq += 1 }; p += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `word_ngrams(text, n)` → array<string>: every word n-gram occurrence in
  * order (NOT deduplicated — frequency counting needs multiplicity),
  * tokens lowercased and joined by single spaces; same tokenizer as
  * [[ShingleHashes]].
  *
  * Why an expression: the compositional form
  * `transform(sequence(...), i => concat_ws(" ", element_at(toks, i+j)...))`
  * re-inlines the tokenizer tree at every `element_at` reference and, being
  * a higher-order function, falls out of whole-stage codegen — measured
  * 10 s vs sub-second for the corpus-wide trigram count at sf0.1. One pass,
  * O(chars + tokens·n). Semantics equal to the compositional form
  * (asserted in FunctionsSpec). */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.toString
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) tokens += text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    }
    if (tokens.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val m = tokens.length - n + 1
    val out = new Array[AnyRef](m)
    val sb = new java.lang.StringBuilder(32)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens(j + k))
        k += 1
      }
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `char_ngrams(text, n)` → array<string>: every sliding CODEPOINT n-gram
  * of the lowercased text, in order, multiplicity kept (frequency counting
  * — the Cavnar–Trenkle profile input). Codepoint-indexed so multibyte
  * text (e.g. CJK) grams match engines whose substr counts characters.
  * Why an expression: the compositional `transform(sequence, substr…)`
  * form re-seeks the string per element — O(len²) per document — and
  * falls out of codegen (see [[WordNGrams]]); this is one O(len) pass. */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def prettyName: String = "char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val cps = v.toString.toLowerCase(java.util.Locale.ROOT).codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val m = cps.length - n + 1
    val out = new Array[AnyRef](m)
    var j = 0
    while (j < m) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(cps, j, n))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `char_ngram_counts(text, n)` → array<struct<g:string, c:bigint>>: the
  * DISTINCT codepoint n-grams of the lowercased text with their counts,
  * sorted by (c DESC, g ASC) — i.e. already in Cavnar–Trenkle rank order
  * (array index + 1 = the gram's rank). Same tokenization as
  * [[CharNGrams]] (codepoint-indexed, lowercased, multiplicity counted).
  *
  * Why an expression: a document's gram histogram is a pure per-row
  * computation — every gram lives in the row's own text — so building it
  * via `explode` + `groupBy(doc, gram)` pays a corpus-wide shuffle of
  * |grams| rows (the dominant cost of the d49 bench row, ~2 s of 3.5 s
  * at sf0.1) for something a single O(len + d·log d) pass computes in
  * place. Ties sort by UTF8String BINARY order (not Java UTF-16 order)
  * to match Spark's own StringType ordering and the DuckDB oracle. */
case class CharNGramCounts(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def prettyName: String = "char_ngram_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val cps = v.toString.toLowerCase(java.util.Locale.ROOT).codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val m = cps.length - n + 1
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long](64)
    var j = 0
    while (j < m) {
      val g = org.apache.spark.unsafe.types.UTF8String.fromString(new String(cps, j, n))
      counts.merge(g, 1L, (a, b) => a + b)
      j += 1
    }
    val entries = new Array[(org.apache.spark.unsafe.types.UTF8String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) { val e = it.next(); entries(k) = (e.getKey, e.getValue); k += 1 }
    java.util.Arrays.sort(entries, new java.util.Comparator[(org.apache.spark.unsafe.types.UTF8String, Long)] {
      def compare(a: (org.apache.spark.unsafe.types.UTF8String, Long),
                  b: (org.apache.spark.unsafe.types.UTF8String, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2)
        if (byCount != 0) byCount else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (g, c) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](g, c)): AnyRef
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `word_counts(text)` → array<struct<g:string, c:bigint>>: the DISTINCT
  * words of the text with their counts, sorted by g ASC (deterministic).
  * Tokenization matches [[graft.operators.TextAnalysis.words]] exactly:
  * lowercase, split on non-letter/non-number runs, empties dropped — so
  * `explode(word_counts(t))` ≡ `explode(words(t))` grouped per row.
  *
  * Why an expression: a document's word histogram is a pure per-row
  * computation, so building it here instead of explode + groupBy(doc, w)
  * turns the corpus-side input of any downstream join/aggregate from
  * per-TOKEN rows into per-(doc, distinct word) rows — no corpus-wide
  * (doc, word) shuffle, and a Generate that emits vocabulary-bounded
  * rows per doc (the d48 BPE-tokenize hot path). */
case class WordCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "word_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  private val splitRe = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  override def nullSafeEval(v: Any): Any = {
    val toks = splitRe.split(v.toString.toLowerCase(java.util.Locale.ROOT))
    val counts = new java.util.TreeMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        counts.merge(
          org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)),
          1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `value_counts(arr)` → array<struct<g:string, c:bigint>>: the DISTINCT
  * string values of the input array with their multiplicities, sorted by
  * g ASC (UTF8String binary order, matching Spark's own StringType
  * ordering). The array-input sibling of [[WordCounts]]: one row-local
  * pass instead of explode + groupBy(id, value) — the repetition-signal
  * rows (d54) read per-doc n-gram multiplicities from it without a
  * corpus-wide (doc, gram) shuffle. */
case class ValueCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "value_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val counts = new java.util.TreeMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i))
        counts.merge(arr.getUTF8String(i).clone(), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `token_hashes(text)` → array<bigint>: 64-bit hashes of each token in
  * order (not deduplicated) — the SimHash input stream. Same tokenizer and
  * token hash as [[ShingleHashes]]. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val s = text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        var h = 0xcbf29ce484222325L
        var c = 0
        while (c < s.length) { h = (h ^ s.charAt(c)) * 0x100000001b3L; c += 1 }
        out += Mix.fmix64(h)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `simhash64(tokenHashes)` → bigint.
  *
  * Charikar SimHash: each token hash votes ±1 per bit position; the result
  * bit is 1 iff the vote sum is positive. Near-duplicate documents land at
  * small Hamming distance. Single pass, fixed 64-counter state.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = Mix.fmix64(arr.getLong(j))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `band_keys64(signature, bands)` → array<bigint> of length `bands`.
  *
  * Splits a MinHash signature into `bands` equal slices and hash-combines
  * each slice into one 64-bit band key (fmix64 chain seeded by the band
  * index, so equal slices in different bands never alias). Replaces the
  * HOF formulation `xxhash64(concat_ws(",", slice(sig, …)))`, which
  * stringifies every slice element — pure integer mixing, one pass, no
  * allocation beyond the result. Keys only ever feed LSH bucket equality,
  * so the exact mixing constants are free to choose.
  */
case class BandKeys64(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0, "bands must be positive")

  override def prettyName: String = "band_keys64"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0 || n % bands != 0) throw new IllegalArgumentException(
      s"band_keys64: signature length $n is not a positive multiple of bands=$bands " +
        "(trailing elements would be silently dropped)")
    val rows = n / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Mix.fmix64(0x9e3779b97f4a7c15L * (b + 1))
      var i = b * rows
      val end = i + rows
      while (i < end) {
        h = Mix.fmix64(h ^ arr.getLong(i))
        i += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `hamming64(a, b)` → int: Hamming distance between two 64-bit hashes. */
case class Hamming64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def prettyName: String = "hamming64"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
