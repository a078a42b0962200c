package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed imperative aggregate: top-k largest values of a BIGINT column,
  * returned in descending order.
  *
  * Demonstrates the reference's imperative-aggregate surface
  * (spear-core/src/main/scala/spear/expressions/aggregates/interfaces.scala:86-126,
  * `ImperativeAggregateFunction[T]` with update/merge/result over a typed
  * state buffer) on Spark's idiomatic equivalent: an
  * `Aggregator[IN, BUF, OUT]` registered via `functions.udaf`. Unlike the
  * declarative [[ProductAgg]] this carries an arbitrary Scala object as the
  * buffer — the path users take when an aggregate's state can't be a fixed
  * tuple of Catalyst expressions.
  *
  * Scale notes: the buffer is bounded at k elements, so partial aggregation
  * (map-side combine) ships at most k longs per group per partition and
  * `merge` is associative/commutative — shuffle volume is O(groups · k),
  * independent of row count. */
class TopKLongAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  // buffer invariant: ascending-sorted, length <= k (the k largest so far)
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] =
    if (buf.length < k) {
      val out = buf :+ x
      java.util.Arrays.sort(out)
      out
    } else if (x > buf(0)) {
      val out = buf.clone()
      out(0) = x
      java.util.Arrays.sort(out)
      out
    } else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val all = a ++ b
    java.util.Arrays.sort(all)
    all.takeRight(k)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf.reverse // descending

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
