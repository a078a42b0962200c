package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector kernels over `array<float>` embedding columns.
  *
  * Native Catalyst expressions (not UDFs): operate directly on Catalyst
  * [[ArrayData]] with primitive accessors — no per-row boxing, no
  * serialization round-trip — and generate tight scalar loops via codegen so
  * they stay inside whole-stage codegen on the scan→score→topK hot path.
  * Accumulation is double-precision for deterministic, order-independent
  * (sequential) results across engines.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
}

/** dot(a, b) = sum_i a_i * b_i (double accumulation). */
case class DotProductF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot(a,b) / (||a|| * ||b||); NULL if either norm is 0.
  * Single pass over both arrays. */
case class CosineSimF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_f32"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** l2norm(a) = sqrt(sum_i a_i^2). */
case class L2NormF32(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "l2norm_f32"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `srp_band_keys(vec, bands, bitsPerBand, seed)` → array<bigint> of `bands`
  * sign-random-projection LSH band keys for an `array<float>` embedding.
  *
  * Bit i of band b is the sign of the dot product with pseudo-random
  * hyperplane (b, i); hyperplane components are ±1 derived from `fmix64`
  * integer mixing (one mix per lane × dimension — no string hashing, unlike
  * the HOF-composed [[graft.operators.Similarity.srpSketch]], which this
  * supersedes for banded use). Two vectors at cosine c agree on one bit with
  * probability 1 − acos(c)/π, so with b bands of r bits a pair is a
  * candidate with probability 1 − (1 − p^r)^b — the classic LSH banding
  * amplification (same shape as MinHash banding, Broder '97 / Charikar '02).
  * Defaults (12 bands × 12 bits) give ≈ 0.98 recall at cosine 0.95 and pass
  * ≈ 0.3 % of uncorrelated pairs, with exact-cosine verification restoring
  * full precision downstream.
  *
  * Computed once per row before the shuffle (sketch cost amortizes over the
  * corpus snapshot; persist/bucket the keyed table at scale), so
  * CodegenFallback is acceptable here — it never sits inside the join's
  * per-candidate hot loop. Reference scope: spear has no ANN operator; this
  * backs the LLM-pipeline embedding near-dup requirement. */
case class SrpBandKeys(child: Expression, bands: Int, bitsPerBand: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0, "bands must be positive")
  require(bitsPerBand > 0 && bitsPerBand <= 60, "bitsPerBand must be in [1, 60]")

  override def prettyName: String = "srp_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // one lane per (band, bit); lane g's hyperplane component for dimension j
  // is the low bit of fmix64(laneSeeds(g) ^ golden*(j+1))
  private lazy val laneSeeds: Array[Long] = {
    val a = new Array[Long](bands * bitsPerBand)
    var g = 0
    while (g < a.length) {
      a(g) = Mix.fmix64(seed + 0x9e3779b97f4a7c15L * (g + 1))
      g += 1
    }
    a
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nLanes = bands * bitsPerBand
    val acc = new Array[Double](nLanes)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = arr.getFloat(j).toDouble
      val jm = 0x9e3779b97f4a7c15L * (j + 1)
      var g = 0
      while (g < nLanes) {
        if ((Mix.fmix64(laneSeeds(g) ^ jm) & 1L) == 0L) acc(g) += x
        else acc(g) -= x
        g += 1
      }
      j += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        if (acc(b * bitsPerBand + i) >= 0) key |= 1L << i
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
