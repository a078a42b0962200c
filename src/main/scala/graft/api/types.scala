package graft.api

import org.apache.spark.sql.types._

/** Reference type-name aliases (SURVEY.md §1.2) so reference-style code
  * (`'x cast IntType`) compiles unchanged. All map onto Spark SQL types —
  * we never reimplement a type system. */
object types {
  val NullType: DataType = org.apache.spark.sql.types.NullType
  val BooleanType: DataType = org.apache.spark.sql.types.BooleanType
  val StringType: DataType = org.apache.spark.sql.types.StringType
  val DateType: DataType = org.apache.spark.sql.types.DateType
  val TimestampType: DataType = org.apache.spark.sql.types.TimestampType
  val ByteType: DataType = org.apache.spark.sql.types.ByteType
  val ShortType: DataType = org.apache.spark.sql.types.ShortType
  /** reference `IntType` = Spark `IntegerType` (DataType.scala:numericTypes) */
  val IntType: DataType = org.apache.spark.sql.types.IntegerType
  val LongType: DataType = org.apache.spark.sql.types.LongType
  val FloatType: DataType = org.apache.spark.sql.types.FloatType
  val DoubleType: DataType = org.apache.spark.sql.types.DoubleType

  def ArrayType(elem: DataType, nullable: Boolean = true): DataType =
    org.apache.spark.sql.types.ArrayType(elem, nullable)
  def MapType(k: DataType, v: DataType, valueNullable: Boolean = true): DataType =
    org.apache.spark.sql.types.MapType(k, v, valueNullable)

  /** Widest implicitly-castable type, per the reference's cast lattice
    * (Cast.scala:289-295 `widestTypeOf`): numerics widen
    * byte→short→int→long→float→double; anything widens to string. Used by
    * the facade's Union to align schemata (LogicalPlan.scala:214-238). */
  def widestTypeOf(a: DataType, b: DataType): Option[DataType] = {
    val numericOrder: Seq[DataType] =
      Seq(ByteType, ShortType, IntType, LongType, FloatType, DoubleType)
    if (a == b) Some(a)
    else if (a == NullType) Some(b)
    else if (b == NullType) Some(a)
    else if (numericOrder.contains(a) && numericOrder.contains(b))
      Some(numericOrder(math.max(numericOrder.indexOf(a), numericOrder.indexOf(b))))
    else if (a == StringType || b == StringType) Some(StringType)
    else if ((a == BooleanType && numericOrder.contains(b)) ||
             (b == BooleanType && numericOrder.contains(a)))
      // reference casts int→boolean implicitly (Cast.scala:74-80); for union
      // alignment pick the numeric side
      Some(if (a == BooleanType) b else a)
    else None
  }
}
