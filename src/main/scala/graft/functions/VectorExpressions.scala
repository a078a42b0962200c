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

/** dot(a, b) = sum_i a_i * b_i (double accumulation). Raises on a length
  * mismatch ([[VectorCodebook.requireSameLength]]) — never truncates. */
case class DotProductF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    VectorCodebook.requireSameLength(n, b.numElements(), prettyName)
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
         |int $n = $a.numElements();
         |graft.functions.VectorCodebook.requireSameLength($n, $b.numElements(), "dot_f32");
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
    val n = a.numElements()
    VectorCodebook.requireSameLength(n, b.numElements(), prettyName)
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
         |int $n = $a.numElements();
         |graft.functions.VectorCodebook.requireSameLength($n, $b.numElements(), "cosine_f32");
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

/** Shared loop kernels for the codebook-assignment expressions below;
  * also what their generated code calls, so interpreted eval and codegen
  * run the identical (JIT-compiled) arithmetic. */
object VectorCodebook {

  /** Loud contract guard shared by every binary vector kernel (and the
    * codebook kernels below): a length mismatch between the two sides is
    * corrupt or schema-drifted data — one 48-wide row among 64-wide
    * embeddings — and silently min-truncating it yields
    * plausible-but-wrong scores in every ANN/retrieval operator at once.
    * The repo's convention is loud guards at contract boundaries
    * (dedupLines, requireMonotoneIds, hamiltonAllocate), so the kernels
    * raise here instead. Called from both the interpreted path and the
    * generated code (one static call — no codegen bloat). */
  def requireSameLength(a: Int, b: Int, op: String): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"$op: ragged vector inputs ($a vs $b elements) — embedding " +
        "columns must be fixed-width; a mismatched row is corrupt or " +
        "schema-drifted data, not a shorter vector to truncate against")

  /** Index of the max-cosine centroid, replicating a sort by
    * (cosine DESC NULLS LAST, index ASC): strict improvement replaces
    * (ties keep the smaller index), a zero-norm pair (cosine NULL) never
    * wins, NaN sorts above all reals (Spark double ordering), and if every
    * candidate is null the smallest index wins. Cosine arithmetic is
    * element-for-element the [[CosineSimF32]] kernel, so assignments match
    * the expression-composed formulation bit-exactly. */
  def nearestCell(a: ArrayData, cents: Array[Array[Float]]): Int = {
    var best = -1
    var bestCos = 0.0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      requireSameLength(a.numElements(), c.length, "nearest_cell_f32")
      val n = c.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = a.getFloat(j).toDouble
        val y = c(j).toDouble
        dot += x * y; na += x * x; nb += y * y
        j += 1
      }
      if (na != 0.0 && nb != 0.0) {
        val cos = dot / (math.sqrt(na) * math.sqrt(nb))
        if (best < 0 || cos > bestCos ||
            (cos.isNaN && !bestCos.isNaN)) {
          best = i; bestCos = cos
        }
      }
      i += 1
    }
    math.max(best, 0)
  }

  /** Index of the min-||sv − c||² centroid within subspace `subId`,
    * replicating a sort by (d2 ASC, code ASC) with d2 = |c|² − 2·sv·c
    * (|c|² precomputed per code in `cSq` — exactly
    * pow(l2norm(c), 2), see [[NearestPqCodeF32]]): strict improvement
    * replaces, NaN loses to any real. Dot arithmetic matches
    * [[DotProductF32]] element-for-element. */
  def nearestCode(
      sv: ArrayData, subId: Int,
      cSq: Array[Array[Double]], cents: Array[Array[Array[Float]]]): Int = {
    val cc = cents(subId)
    val sq = cSq(subId)
    var best = 0
    var bestD2 = 0.0
    var first = true
    var c = 0
    while (c < cc.length) {
      val cent = cc(c)
      requireSameLength(sv.numElements(), cent.length, "nearest_pq_code_f32")
      val n = cent.length
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += sv.getFloat(j).toDouble * cent(j).toDouble
        j += 1
      }
      val d2 = sq(c) - 2.0 * dot
      if (first || d2 < bestD2 || (bestD2.isNaN && !d2.isNaN)) {
        best = c; bestD2 = d2; first = false
      }
      c += 1
    }
    best
  }
}

/** Row-local nearest-centroid assignment over a driver-held codebook baked
  * into the expression as a REFERENCE OBJECT (not an unrolled expression
  * tree): the generated code is one helper call, so the method stays far
  * under HotSpot's ~8 KB JIT limit no matter how large k×dim is — an
  * unrolled per-candidate tree compiles (under Spark's 64 KB codegen
  * limit) but exceeds the JIT limit and runs in the bytecode interpreter,
  * measured 5× slower on the k-means training pass. Returns the 0-based
  * cell index (callers map index → cell id). */
case class NearestCellF32(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_cell_f32"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    VectorCodebook.nearestCell(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cents", cents, "float[][]")
      s"${ev.value} = graft.functions.VectorCodebook.nearestCell($a, $ref);"
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[NearestCellF32]] for PQ training: min-L2 code within the row's
  * subspace. `cSq(sub)(code)` must equal `pow(l2normF32(c), 2)` of the
  * baked centroid (callers compute it with the same sqrt-then-square
  * double arithmetic) so distances match the expression-composed
  * formulation bit-exactly. */
case class NearestPqCodeF32(
    left: Expression, right: Expression,
    cSq: Array[Array[Double]], cents: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def prettyName: String = "nearest_pq_code_f32"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(sv: Any, sid: Any): Any =
    VectorCodebook.nearestCode(
      sv.asInstanceOf[ArrayData], sid.asInstanceOf[Int], cSq, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, sid) => {
      val sq = ctx.addReferenceObj("cSq", cSq, "double[][]")
      val ref = ctx.addReferenceObj("cents", cents, "float[][][]")
      s"${ev.value} = graft.functions.VectorCodebook.nearestCode($sv, $sid, $sq, $ref);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot(a, b) over int8 code arrays (`array<tinyint>`), exact long
  * accumulation — the serving kernel for the quantized tier (e13). The
  * higher-order `aggregate(zip_with(...))` formulation it replaces is
  * CodegenFallback and re-enters the interpreter per element. */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_i8"
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    VectorCodebook.requireSameLength(n, b.numElements(), prettyName)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
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
         |int $n = $a.numElements();
         |graft.functions.VectorCodebook.requireSameLength($n, $b.numElements(), "dot_i8");
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ a_i² over an int8 code array, exact long accumulation. */
case class NormSqI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "normsq_i8"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < a.numElements()) {
      val x = a.getByte(i).toLong
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $x = (long) $a.getByte($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** dot(a, b) over `array<bigint>` dense vectors, exact long accumulation —
  * the pair-join serving kernel for hashed-BoW retrieval (e26). Same
  * rationale as [[DotProductI8]]: the HOF `aggregate(zip_with(...))`
  * formulation is CodegenFallback and re-enters the interpreter per
  * element, which on a chunks × queries crossJoin is the measured 10×+
  * difference. Raises on a length mismatch — never truncates.
  *
  * Null-ELEMENT contract (pinned in FunctionsSpec): a null array element
  * contributes 0 to the sum — `getLong` reads a zeroed slot in both the
  * unsafe and generic representations. Producers in this repo
  * ([[graft.operators.Multimodal]]'s dense BoW) never emit null
  * elements; the documented semantics exist so a `transform(...)`-built
  * input whose TYPE says containsNull=true behaves deterministically
  * rather than being rejected. */
case class DotProductI64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_i64"
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    VectorCodebook.requireSameLength(n, b.numElements(), prettyName)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
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
         |int $n = $a.numElements();
         |graft.functions.VectorCodebook.requireSameLength($n, $b.numElements(), "dot_i64");
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
