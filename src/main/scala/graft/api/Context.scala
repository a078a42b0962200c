package graft.api

import org.apache.spark.sql.{DataFrame => SparkDF, Encoder, SparkSession}

import scala.reflect.runtime.universe.TypeTag

/** Session entry point mirroring the reference `Context`
  * (spear-core/src/main/scala/spear/Context.scala:11-41): `sql`, `table`,
  * `lift` (local Scala collections of case classes), `values`, `range`.
  * Everything delegates to a [[SparkSession]]; plans are eagerly analyzed
  * (Spark's `Dataset.ofRows` asserts analysis, matching the reference's
  * eager-analysis/lazy-execution contract, DataFrame.scala:11-16).
  */
class Context(val spark: SparkSession) {
  graft.functions.GraftFunctions.register(spark)

  /** SQL entry point (Context.scala:22). Spark SQL is a strict superset of
    * the reference dialect except documented deltas (SURVEY §7.1); the one
    * silent divergence — `^` parses as POWER in spear
    * (arithmetics.scala:96-109) but bitwise XOR in Spark — is covered by
    * [[spearSql]].
    *
    * Identifier case (reference Name.scala:14-23): spear treats unquoted
    * identifiers as case-insensitive and `"quoted"` ones as case-sensitive.
    * Spark has no per-identifier mode — the global
    * `spark.sql.caseSensitive=false` default governs both forms, so the
    * unquoted half matches the reference exactly while wrong-case quoted
    * identifiers resolve here instead of erroring. Documented divergence,
    * pinned by FacadeSpec. */
  def sql(query: String): DataFrame = new DataFrame(spark.sql(query), this)

  /** Spear-dialect SQL: Spark SQL with `^` meaning POWER. The query is
    * parsed by Spark's parser, then every BitwiseXor in the unresolved plan
    * is rewritten to Pow over doubles (spear's Power returns double,
    * arithmetics.scala:96-109) before analysis/execution — a plan-level
    * rewrite, not string munging, so `^` inside literals is untouched. The
    * rewrite descends into subquery expressions (transformDownWithSubqueries)
    * and CTE bodies (UnresolvedWith keeps cteRelations as innerChildren,
    * which plain transforms skip), so `^` means power at any nesting depth. */
  def spearSql(query: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseXor, Cast, Pow}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    import org.apache.spark.sql.types.DoubleType
    def rewrite(plan: LogicalPlan): LogicalPlan =
      plan.transformDownWithSubqueries { case node =>
        val withCtes = node match {
          case w: UnresolvedWith =>
            w.copy(cteRelations = w.cteRelations.map { case (name, rel, maxRec) =>
              (name, rewrite(rel).asInstanceOf[
                org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], maxRec)
            })
          case other => other
        }
        withCtes.transformExpressions {
          case BitwiseXor(l, r) => Pow(Cast(l, DoubleType), Cast(r, DoubleType))
        }
      }
    val parsed = spark.sessionState.sqlParser.parsePlan(query)
    new DataFrame(
      org.apache.spark.sql.GraftPlanBridge.ofRows(spark, rewrite(parsed)), this)
  }

  /** Catalog lookup (Context.scala:24-25). */
  def table(name: Symbol): DataFrame = table(name.name)
  def table(name: String): DataFrame = new DataFrame(spark.table(name), this)

  /** Lift a local collection of case-class instances (Context.scala:27-30).
    * Schema inference via Spark encoders replaces the reference's runtime
    * reflection (reflection/package.scala:9-64). */
  def lift[T <: Product : TypeTag](data: Seq[T]): DataFrame =
    new DataFrame(spark.createDataFrame(data), this)

  def lift[T <: Product : TypeTag](first: T, rest: T*): DataFrame =
    lift(first +: rest)

  /** Lift a typed dataset with full Encoder support. */
  def liftDS[T: Encoder](data: Seq[T]): DataFrame = {
    val ds = spark.createDataset(data)
    new DataFrame(ds.toDF(), this)
  }

  /** One-row, zero-column relation projected through exprs
    * (Context.scala:18-20, `SELECT <exprs>` without FROM). */
  def values(exprs: org.apache.spark.sql.Column*): DataFrame =
    new DataFrame(spark.range(1).select(exprs: _*), this)

  /** `range(end)` → id BIGINT! (Context.scala:32-40). */
  def range(end: Long): DataFrame = new DataFrame(spark.range(end).toDF(), this)
  def range(begin: Long, end: Long): DataFrame =
    new DataFrame(spark.range(begin, end).toDF(), this)
  def range(begin: Long, end: Long, step: Long): DataFrame =
    new DataFrame(spark.range(begin, end, step).toDF(), this)

  private[api] def wrap(df: SparkDF): DataFrame = new DataFrame(df, this)
}

object Context {
  /** Build a context on a fresh local session (testing convenience). */
  def local(parallelism: Int = 4): Context = {
    val spark = SparkSession.builder()
      .master(s"local[$parallelism]")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    new Context(spark)
  }
}
