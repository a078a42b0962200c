package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `product(x)` aggregate: multiply-reduce skipping NULLs, NULL on empty
  * input. Mirrors the reference's `Product` aggregate
  * (spear-core/src/main/scala/spear/expressions/aggregates/numeric.scala:44-50),
  * which Spark lacks as a builtin.
  *
  * Implemented as a [[DeclarativeAggregate]] — pure Catalyst expressions for
  * init/update/merge, so it participates in whole-stage codegen and
  * partial (map-side) aggregation, unlike a UDAF. Scales to arbitrarily many
  * rows per group with no per-row object allocation.
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "product"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(product)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  // null-skip semantics: null child leaves the buffer; null buffer adopts
  // the child; otherwise multiply.
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(product, child), product, child)))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(
      Multiply(product.left, product.right), product.left, product.right)))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}
