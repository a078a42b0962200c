package graft.api

import org.apache.spark.sql.{Column, Row, DataFrame => SparkDF}
import org.apache.spark.sql.functions.{col, lit}

/** Reference-shaped DataFrame facade (spear-core/src/main/scala/spear/
  * DataFrame.scala:22-220) over a Spark `Dataset[Row]`.
  *
  * Mirrors the full combinator surface: select/filter/where/limit/distinct/
  * crossJoin/join/leftJoin/rightJoin/outerJoin (+ `Joined.on`)/orderBy/
  * subquery/union/intersect/except/groupBy (+ `Grouped.having.orderBy.agg`)/
  * agg/rename, and the actions iterator/toSeq/show/explain/showSchema/
  * asTable. Execution, optimization and physical planning are entirely
  * Catalyst/Tungsten — this layer only adapts API shape and the documented
  * semantic deltas (SURVEY §7.4), e.g. Union's widest-type alignment.
  */
class DataFrame(val df: SparkDF, val context: Context) {

  private def wrap(d: SparkDF) = new DataFrame(d, context)

  // ---- projection / filtering ------------------------------------------

  def select(first: Column, rest: Column*): DataFrame =
    wrap(df.select((first +: rest): _*))
  def select(cols: Seq[Column]): DataFrame = wrap(df.select(cols: _*))

  def filter(cond: Column): DataFrame = wrap(df.filter(cond))
  def where(cond: Column): DataFrame = filter(cond)

  /** Column lookup with the reference's per-identifier case semantics
    * ([[Name]]): `col("name")` matches any-case (regular identifier),
    * `col("\"Name\"")` must match exactly (delimited identifier). Errors
    * on no match and on ambiguity — the same failures the reference's
    * resolver raises (spear Name equality drives its resolution). */
  def col(name: String): Column = {
    val n = Name.parse(name)
    val hits = df.columns.zipWithIndex.filter {
      case (c, _) => Name.caseInsensitive(c) == n
    }
    hits match {
      // positional hand-off: a name-based df.col would re-resolve under
      // Spark's GLOBAL case mode and throw on case-twin siblings
      case Array((_, i)) => org.apache.spark.sql.GraftPlanBridge.colAt(df, i)
      case Array() => throw new IllegalArgumentException(
        s"no column matching $n among ${df.columns.mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous identifier $n: matches ${many.map(_._1).mkString(", ")}")
    }
  }
  def apply(name: String): Column = col(name)

  def limit(n: Int): DataFrame = wrap(df.limit(n))
  def distinct: DataFrame = wrap(df.distinct())

  /** Prefix-rename of output columns (reference `Rename`,
    * LogicalPlan.scala:127-173): first `names.length` columns renamed, the
    * rest keep their names. */
  def rename(names: Symbol*): DataFrame = {
    val cur = df.columns
    require(names.length <= cur.length,
      s"rename: ${names.length} names for ${cur.length} columns")
    val full = names.map(_.name) ++ cur.drop(names.length)
    wrap(df.toDF(full: _*))
  }

  // ---- joins -------------------------------------------------------------

  def crossJoin(right: DataFrame): DataFrame = wrap(df.crossJoin(right.df))
  def join(right: DataFrame): Joined = new Joined(this, right, "inner")
  def leftJoin(right: DataFrame): Joined = new Joined(this, right, "left_outer")
  def rightJoin(right: DataFrame): Joined = new Joined(this, right, "right_outer")
  def outerJoin(right: DataFrame): Joined = new Joined(this, right, "full_outer")
  /** surplus over reference (§2.4): semi/anti joins */
  def semiJoin(right: DataFrame): Joined = new Joined(this, right, "left_semi")
  def antiJoin(right: DataFrame): Joined = new Joined(this, right, "left_anti")

  // ---- set ops (reference widening semantics, LogicalPlan.scala:193-238) --

  private def aligned(that: DataFrame): (SparkDF, SparkDF) = {
    val (l, r) = (df, that.df)
    require(l.columns.length == r.columns.length,
      s"set op arity mismatch: ${l.columns.toSeq} vs ${r.columns.toSeq}")
    require(l.columns.map(_.toLowerCase).sameElements(r.columns.map(_.toLowerCase)),
      s"set op requires equal column names: ${l.columns.toSeq} vs ${r.columns.toSeq}")
    val widened = l.schema.fields.zip(r.schema.fields).map { case (lf, rf) =>
      types.widestTypeOf(lf.dataType, rf.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"no widest type for ${lf.name}: ${lf.dataType} vs ${rf.dataType}"))
    }
    def castTo(d: SparkDF) = d.select(d.columns.zip(widened).map {
      case (c, t) => d.col(c).cast(t).as(c)
    }: _*)
    (castTo(l), castTo(r))
  }

  /** Bag union — the reference parses UNION and UNION ALL identically
    * (QueryExpressionParser.scala:373-375); schemata aligned by widest type. */
  def union(that: DataFrame): DataFrame = {
    val (l, r) = aligned(that)
    wrap(l.union(r))
  }
  /** Reference Intersect/Except are BAG semantics — the interpreter runs
    * `Seq.intersect` (min multiplicity per row) and `Seq.diff` (removes one
    * occurrence per right-side row), spear-local basicOperators.scala:69,75.
    * Spark's `intersect`/`except` deduplicate (SQL set semantics);
    * `intersectAll`/`exceptAll` match the reference exactly. */
  def intersect(that: DataFrame): DataFrame = {
    val (l, r) = aligned(that)
    wrap(l.intersectAll(r))
  }
  def except(that: DataFrame): DataFrame = {
    val (l, r) = aligned(that)
    wrap(l.exceptAll(r))
  }

  // ---- sort / scoping ------------------------------------------------------

  def orderBy(first: Column, rest: Column*): DataFrame =
    wrap(df.orderBy((first +: rest): _*))
  def orderBy(cols: Seq[Column]): DataFrame = wrap(df.orderBy(cols: _*))

  def subquery(alias: Symbol): DataFrame = wrap(df.alias(alias.name))

  // ---- aggregation (reference Grouped.having/orderBy/agg,
  //      DataFrame.scala:190-220) ---------------------------------------------

  def groupBy(keys: Column*): Grouped = new Grouped(this, keys)
  def agg(first: Column, rest: Column*): DataFrame =
    new Grouped(this, Nil).agg(first, rest: _*)

  // ---- actions ----------------------------------------------------------------

  def iterator: Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
  def toSeq: Seq[Row] = df.collect().toSeq
  def show(): Unit = df.show()
  def show(n: Int, truncate: Boolean = true): Unit = df.show(n, truncate)
  def explain(): Unit = df.explain()
  def explain(extended: Boolean): Unit = df.explain(extended)
  def explainExtended(): Unit = df.explain(true)

  /** Reference explain rendering (reference DataFrame.scala:96-113): the
    * four compilation stages under the reference's `══ … ══` section
    * headers, so transcript-shaped tooling keyed on those headers keeps
    * working against this engine. The stages map 1:1 onto Spark's:
    * parsed → `qe.logical`, analyzed → `qe.analyzed`, optimized →
    * `qe.optimizedPlan`, physical → `qe.executedPlan` (what actually
    * runs — including the AQE wrapper, which the reference's interpreted
    * physical tree has no analogue of). */
  def explanationSpear(extended: Boolean = true): String = {
    val qe = df.queryExecution
    def t(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): String =
      p.treeString.stripLineEnd
    if (extended) {
      s"""══ Parsed logical plan ══
         |${t(qe.logical)}
         |
         |══ Analyzed logical plan ══
         |${t(qe.analyzed)}
         |
         |══ Optimized logical plan ══
         |${t(qe.optimizedPlan)}
         |
         |══ Physical plan ══
         |${t(qe.executedPlan)}
         |""".stripMargin
    } else {
      s"""══ Physical plan ══
         |${t(qe.executedPlan)}
         |""".stripMargin
    }
  }

  /** Reference `explain(extended, out)` (DataFrame.scala:115-116). */
  def explainSpear(
      extended: Boolean = false,
      out: java.io.PrintStream = System.out): Unit =
    out.println(explanationSpear(extended))
  def showSchema(): Unit = df.printSchema()
  def schema: org.apache.spark.sql.types.StructType = df.schema

  /** Catalog registration (reference `asTable`, DataFrame.scala:85-86). */
  def asTable(name: Symbol): Unit = asTable(name.name)
  def asTable(name: String): Unit = df.createOrReplaceTempView(name)
}

/** Join builder: `left join right on condition` (reference `Joined.on`,
  * DataFrame.scala joins + LogicalPlan.scala:292-298 — multiple `on` calls
  * AND their predicates). Without `on`, inner join degrades to cross. */
class Joined(left: DataFrame, right: DataFrame, joinType: String) {
  def on(condition: Column): DataFrame =
    new DataFrame(left.df.join(right.df, condition, joinType), left.context)

  /** Equi-join on shared column names (Spark-style convenience). */
  def using(cols: String*): DataFrame =
    new DataFrame(left.df.join(right.df, cols, joinType), left.context)
}

/** Aggregation builder mirroring reference `Grouped` with HAVING and
  * ORDER BY captured before `agg` (DataFrame.scala:190-220,
  * UnresolvedAggregate semantics LogicalPlan.scala:308-342). */
class Grouped(
    child: DataFrame,
    keys: Seq[Column],
    havingConds: Seq[Column] = Nil,
    order: Seq[Column] = Nil) {

  def having(conditions: Column*): Grouped =
    new Grouped(child, keys, havingConds ++ conditions, order)

  def orderBy(ordering: Column*): Grouped =
    new Grouped(child, keys, havingConds, order ++ ordering)

  def agg(first: Column, rest: Column*): DataFrame = {
    val aggs = first +: rest
    val grouped = child.df.groupBy(keys: _*)
    var out = grouped.agg(aggs.head, aggs.tail: _*)
    havingConds.foreach(c => out = out.filter(c))
    if (order.nonEmpty) out = out.orderBy(order: _*)
    new DataFrame(out, child.context)
  }
}
