package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable-sketch aggregates beyond the built-in HLL family (q98):
  * KLL quantile sketches and Misra-Gries frequent-items sketches, both from
  * the Apache DataSketches library already on the Spark classpath.
  *
  * Why they matter at 100 TB: a profile pass that needs per-partition
  * quantiles or heavy hitters cannot afford the exact formulations — exact
  * percentiles buffer every value per group, exact top-k shuffles the full
  * key space. These sketches are FIXED-SIZE map-side state with an
  * associative, commutative merge, so they ride Spark's standard two-phase
  * aggregation (partial sketch per partition → merged sketch per group),
  * and — like the q98 HLL rows — their serialized form can be PERSISTED
  * per (partition, day) and unioned later to answer any range question
  * without rescanning raw data.
  *
  * Implemented as Catalyst [[TypedImperativeAggregate]]s (the same
  * machinery Spark's own `hll_sketch_agg` / `percentile` use): the live
  * sketch object is the per-group buffer, serialization happens only at
  * shuffle boundaries. Registered in [[GraftFunctions]]; no UDFs.
  */
abstract class SketchAgg[S] extends TypedImperativeAggregate[S]
    with UnaryLike[Expression] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  /** Required input type, enforced at ANALYSIS time — a wrong-typed
    * column must fail the plan, not a task-side asInstanceOf deep in
    * update() after the scan already ran. */
  protected def requiredInputType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == requiredInputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${requiredInputType.simpleString} input, " +
        s"got ${child.dataType.simpleString}")
}

/** Analysis-time input check for the post-aggregation extractors: sketch
  * bytes must arrive as BinaryType or the query fails in ANALYSIS — the
  * same policy [[SketchAgg]] enforces for the aggregates — instead of a
  * task-side ClassCastException/sketch-deserialize error after the scan
  * already ran. */
private[functions] trait BinarySketchInput { self: Expression =>
  protected def checkBinaryInputs(inputs: Seq[Expression]): TypeCheckResult =
    inputs.find(_.dataType != BinaryType) match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary sketch input, " +
          s"got ${e.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** Shared KLL machinery: the two KLL aggregates differ only in how a row
  * reaches the buffer (raw value vs serialized-sketch union). */
abstract class KllAggBase extends SketchAgg[KllDoublesSketch] {
  protected def k: Int

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_agg(x)` — KLL quantile sketch over a DOUBLE column; returns the
  * serialized sketch. Default k=200 bounds two-sided normalized rank error
  * at ~1.65% with 99% confidence (DataSketches published bound), i.e. an
  * estimated quantile at rank q is an exact value whose true rank lies in
  * q ± 0.0165 w.h.p., at ~2.5 kB of state regardless of input size. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def prettyName: String = "kll_agg"
  override protected def requiredInputType: DataType = DoubleType

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_merge_agg(sk)` — union serialized KLL sketches (the storage-side
  * half: per-day sketches in, one range sketch out). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def prettyName: String = "kll_merge_agg"
  override protected def requiredInputType: DataType = BinaryType

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_quantile(sk, q)` — extract the rank-q quantile estimate from a
  * serialized KLL sketch. Runs on the handful of post-aggregation group
  * rows (one heapify per call), never in a per-input-row hot path, so
  * interpreted eval is fine — hence [[CodegenFallback]]. */
case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback with BinarySketchInput {
  require(rank >= 0.0 && rank <= 1.0, "rank must be in [0, 1]")

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkBinaryInputs(Seq(child))

  override def nullSafeEval(v: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(
      rank,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
}

/** `theta_agg(x, lgK)` — Theta sketch over a LONG column; returns the
  * compact ordered sketch. Unlike HLL (q98 — union only), Theta sketches
  * support the FULL set algebra: union, intersection, and difference are
  * all computable from the stored sketches, so retention/churn questions
  * ("users active in BOTH ranges", "users lost between releases") are
  * answerable from ~KB per-partition artifacts without touching raw data.
  * State is ≤ 2^lgK 8-byte hashes; below that cardinality the sketch is
  * in exact mode and estimates are the true counts. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SketchAgg[org.apache.datasketches.theta.Union] {
  import org.apache.datasketches.theta.{SetOperation, Union}
  require(lgK >= 4 && lgK <= 26, "lgK out of range")

  override def prettyName: String = "theta_agg"
  override protected def requiredInputType: DataType = LongType

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `theta_setop(a, b, 'union'|'intersect'|'anotb')` — apply a set
  * operation to two serialized Theta sketches and report the result as
  * `struct<est, lb, ub>` at 3 standard deviations (in exact mode
  * lb = est = ub = the true count). Post-aggregation extraction on group
  * rows only. */
case class ThetaSetOpSummary(left: Expression, right: Expression, op: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback with BinarySketchInput {
  import org.apache.datasketches.theta.{SetOperation, Sketch}
  require(Seq("union", "intersect", "anotb").contains(op),
    s"unknown theta set op $op")

  override def prettyName: String = "theta_setop"
  override def checkInputDataTypes(): TypeCheckResult =
    checkBinaryInputs(Seq(left, right))
  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType, nullable = false),
    StructField("lb", DoubleType, nullable = false),
    StructField("ub", DoubleType, nullable = false)))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketch.wrap(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketch.wrap(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    val res = op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(a); u.union(b); u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(a); i.intersect(b); i.getResult
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(a, b)
    }
    InternalRow(res.getEstimate, res.getLowerBound(3), res.getUpperBound(3))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetOpSummary =
    copy(left = l, right = r)
}

/** Mutable buffer for frequent-items aggregation: the live sketch plus
  * the error offset lost to serialization quirks (see [[FreqSerde]]). */
final class FreqBuf(val sk: ItemsSketch[String], var extraErr: Long)

/** Envelope serde for string frequent-items sketches.
  *
  * DataSketches quirk (measured): an ItemsSketch whose counter map has
  * purged down to EMPTY serializes as a fully-empty sketch — the error
  * offset and stream length are silently dropped. Under heavy uniform
  * streams (vocab >> maxMapSize) an empty map is a legitimate end state,
  * and this repo serializes at every partial-aggregation and storage
  * boundary, so the no-false-negatives bound would silently shrink. The
  * envelope prefixes 8 bytes of `extraErr` that absorb the offset of any
  * empty-map sketch at serialize time; [[FreqMaxError]] reports
  * sketch-offset + extraErr, restoring the guarantee: any item whose
  * true count exceeds the REPORTED bound is present (items can only be
  * lost alongside an offset that the envelope preserves). */
private object FreqSerde {
  val serde = new ArrayOfStringsSerDe

  def write(buf: FreqBuf): Array[Byte] = {
    val lost =
      buf.extraErr + (if (buf.sk.getNumActiveItems == 0) buf.sk.getMaximumError else 0L)
    val skBytes = buf.sk.toByteArray(serde)
    val out = java.nio.ByteBuffer.allocate(8 + skBytes.length)
    out.putLong(lost).put(skBytes)
    out.array()
  }

  def read(bytes: Array[Byte]): FreqBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val extra = bb.getLong()
    val rest = new Array[Byte](bytes.length - 8)
    bb.get(rest)
    new FreqBuf(ItemsSketch.getInstance(Memory.wrap(rest), serde), extra)
  }
}

/** Shared frequent-items machinery (see [[KllAggBase]]); buffers carry
  * the [[FreqSerde]] envelope's lost-offset alongside the live sketch. */
abstract class FreqAggBase extends SketchAgg[FreqBuf] {
  protected def maxMapSize: Int

  override def createAggregationBuffer(): FreqBuf =
    new FreqBuf(new ItemsSketch[String](maxMapSize), 0L)

  override def merge(a: FreqBuf, b: FreqBuf): FreqBuf = {
    a.sk.merge(b.sk)
    a.extraErr += b.extraErr
    a
  }

  override def eval(buf: FreqBuf): Any = FreqSerde.write(buf)
  override def serialize(buf: FreqBuf): Array[Byte] = FreqSerde.write(buf)
  override def deserialize(bytes: Array[Byte]): FreqBuf = FreqSerde.read(bytes)
}

/** `freq_agg(term, maxMapSize)` — Misra-Gries frequent-items sketch over a
  * STRING column. State is at most `maxMapSize` counters (power of 2)
  * regardless of vocabulary size; deterministic (no randomness), with the
  * classic guarantees: every item whose true count exceeds
  * `getMaximumError` is retained, and each retained estimate brackets the
  * true count in [lowerBound, upperBound]. Those guarantees — not the
  * internal counter values, which are purge-order-dependent — are what a
  * gate may assert. */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase {
  require(maxMapSize >= 2 && Integer.bitCount(maxMapSize) == 1,
    "maxMapSize must be a power of 2")

  override def prettyName: String = "freq_agg"
  override protected def requiredInputType: DataType = StringType

  override def update(buf: FreqBuf, input: InternalRow): FreqBuf = {
    val v = child.eval(input)
    if (v != null) buf.sk.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** `freq_merge_agg(sk, maxMapSize)` — union serialized frequent-items
  * sketches; error bounds add across merges and the merged sketch reports
  * the combined `getMaximumError`. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase {
  require(maxMapSize >= 2 && Integer.bitCount(maxMapSize) == 1,
    "maxMapSize must be a power of 2")

  override def prettyName: String = "freq_merge_agg"
  override protected def requiredInputType: DataType = BinaryType

  override def update(buf: FreqBuf, input: InternalRow): FreqBuf = {
    val v = child.eval(input)
    if (v != null) {
      val other = FreqSerde.read(v.asInstanceOf[Array[Byte]])
      buf.sk.merge(other.sk)
      buf.extraErr += other.extraErr
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** `freq_items(sk)` — the NO_FALSE_NEGATIVES report of a serialized
  * frequent-items sketch as `array<struct<term, est, lb, ub>>`, ordered by
  * descending estimate. Post-aggregation extraction on group rows only. */
case class FreqItemRows(child: Expression)
  extends UnaryExpression with CodegenFallback with BinarySketchInput {

  override def prettyName: String = "freq_items"
  override def checkInputDataTypes(): TypeCheckResult =
    checkBinaryInputs(Seq(child))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val buf = FreqSerde.read(v.asInstanceOf[Array[Byte]])
    val rows = buf.sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    // widen only the UPPER bound by the envelope's lost offset: the lost
    // offset represents additional UNDERcounting, so the true count may
    // exceed the sketch's ub by extraErr but can never fall below its lb
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate,
        r.getLowerBound,
        r.getUpperBound + buf.extraErr): Any
    })
  }

  override protected def withNewChildInternal(c: Expression): FreqItemRows =
    copy(child = c)
}

/** `freq_max_error(sk)` — the sketch's a-priori error bound: any item with
  * true count above this is guaranteed present in the report. */
case class FreqMaxError(child: Expression)
  extends UnaryExpression with CodegenFallback with BinarySketchInput {

  override def prettyName: String = "freq_max_error"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    checkBinaryInputs(Seq(child))

  override def nullSafeEval(v: Any): Any = {
    val buf = FreqSerde.read(v.asInstanceOf[Array[Byte]])
    buf.sk.getMaximumError + buf.extraErr
  }

  override protected def withNewChildInternal(c: Expression): FreqMaxError =
    copy(child = c)
}
