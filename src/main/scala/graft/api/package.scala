package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Expression DSL mirroring the reference's (spear-core
  * expressions/package.scala + DataFrame DSL): symbol columns (`'id`),
  * `lit`, the reference function registry (FunctionRegistry.scala:38-64)
  * with its exact semantics, and operator sugar on `Column`.
  *
  * `import graft.api._` is the one-line switch for reference users:
  * {{{
  *   val context = Context.local()
  *   context range 10 select ('id as 'key) where ('key % 2 === 0) show ()
  * }}}
  */
package object api {

  /** `'sym` as a column reference. */
  implicit def symbolToColumn(s: Symbol): Column = F.col(s.name)

  /** `$"a.id"` qualified column references (reference named.scala DSL). */
  implicit class GraftStringToColumn(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = F.col(sc.s(args: _*))
  }

  /** literals auto-lift in mixed expressions */
  def lit(v: Any): Column = F.lit(v)

  // ---- the 19-function reference registry (FunctionRegistry.scala:38-64) --

  def count(c: Column): Column = F.count(c)
  def count(s: Symbol): Column = F.count(F.col(s.name))
  def max(c: Column): Column = F.max(c)
  def min(c: Column): Column = F.min(c)
  /** reference default ignoresNull = true (basic.scala:38-108) */
  def first(c: Column): Column = F.first(c, ignoreNulls = true)
  def first(c: Column, ignoresNull: Boolean): Column = F.first(c, ignoresNull)
  def first_value(c: Column): Column = first(c)
  def last(c: Column): Column = F.last(c, ignoreNulls = true)
  def last(c: Column, ignoresNull: Boolean): Column = F.last(c, ignoresNull)
  def last_value(c: Column): Column = last(c)
  /** collects nulls, unlike Spark collect_list (basic.scala:110-126) */
  def array_agg(c: Column): Column = functions.GraftFunctions.arrayAggWithNulls(c)
  def avg(c: Column): Column = F.avg(c)
  def average(c: Column): Column = F.avg(c)
  def sum(c: Column): Column = F.sum(c)
  def product(c: Column): Column = functions.GraftFunctions.product(c)
  def bool_and(c: Column): Column = F.bool_and(c)
  def bool_or(c: Column): Column = F.bool_or(c)
  def coalesce(cs: Column*): Column = F.coalesce(cs: _*)
  def rand(seed: Long): Column = F.rand(seed)
  /** null-skipping `||` (stringExpressions.scala:17-18) */
  def concat(cs: Column*): Column = functions.GraftFunctions.concatSkipNulls(cs: _*)
  /** full-match rlike (stringExpressions.scala:24-37) */
  def rlike(c: Column, pattern: String): Column =
    functions.GraftFunctions.rlikeFull(c, pattern)
  def length(c: Column): Column = F.length(c)

  // conditionals (logicalOperators.scala:42-108)
  def when(cond: Column, value: Any): Column = F.when(cond, value)
  def `if`(cond: Column, yes: Column, no: Column): Column =
    F.when(cond, yes).otherwise(no)
  def nullif(a: Column, b: Column): Column = F.nullif(a, b)
  def isnull(c: Column): Column = F.isnull(c)
  def isnotnull(c: Column): Column = c.isNotNull

  // complex constructors (complexTypes.scala:7-88)
  def struct(cs: Column*): Column = F.struct(cs: _*)
  def named_struct(pairs: (String, Column)*): Column =
    F.struct(pairs.map { case (n, c) => c.as(n) }: _*)
  def array(cs: Column*): Column = F.array(cs: _*)
  def map(cs: Column*): Column = F.map(cs: _*)

  /** Ordered window with the reference's default frame pinned: ROWS
    * UNBOUNDED PRECEDING..CURRENT ROW (spear WindowSpec.scala:78-82).
    * Spark's own default for an ordered spec is RANGE..CURRENT ROW, which
    * differs whenever the ordering key has ties — always pin frames. */
  def windowSpec(partitionCols: Seq[Column], orderCols: Seq[Column])
      : org.apache.spark.sql.expressions.WindowSpec = {
    import org.apache.spark.sql.expressions.Window
    Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** `e ^ n` power operator (arithmetics.scala:96-109; the reference's only
    * exotic operator — Spark `pow`). */
  implicit class GraftColumnOps(private val c: Column) extends AnyVal {
    def ^(other: Column): Column = F.pow(c, other)
    def ^(other: Double): Column = F.pow(c, other)
    /** reference `=/=` spelling for not-equal */
    def =/=(other: Any): Column = c =!= other
    /** integral division (reference `/` on integrals; SURVEY §2.7) */
    def intDiv(other: Column): Column = functions.GraftFunctions.intDiv(c, other)
  }
}
