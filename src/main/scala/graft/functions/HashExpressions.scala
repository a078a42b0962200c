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
