package graft

import graft.api._
import org.apache.spark.sql.Row

/** Reference e2e SQL corpus, replayed VERBATIM through the spear-dialect
  * entry point (`Context.spearSql`): every SQL string from the reference's
  * LocalQueryCompilerSuite.scala, DirectlyExecutableStatementParserSuite
  * .scala, BasicExample.scala, and README.md:63-115 runs unchanged here,
  * asserted against the equivalent Spark-DSL result (or literal expected
  * rows). The parser suite's strings are parse-shape tests in the
  * reference; here they execute end-to-end against small fixtures, which
  * is strictly stronger. Spear-documented semantic deltas covered:
  * `^` = POWER, INTERSECT/EXCEPT = bag (Seq.intersect/Seq.diff,
  * basicOperators.scala:61-76), per-identifier delimited case.
  */
class ReplaySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val context = new Context(spark)

  case class Person(name: String, age: Int)
  case class GPerson(name: String, gender: String, age: Int)

  // t0/t1 for the parser-suite corpus: duplicate row in t0 exercises bag
  // INTERSECT/EXCEPT multiplicity; a null in a exercises NULLS FIRST/LAST
  private lazy val fixtures: Unit = {
    Seq((Option(1), "x"), (Option(1), "x"), (Option(2), "y"),
        (Option(3), "z"), (Option.empty[Int], "n"))
      .toDF("a", "b").createOrReplaceTempView("t0")
    Seq((1, "x"), (2, "y"), (9, "q")).toDF("a", "b")
      .createOrReplaceTempView("t1")
    ()
  }

  private def rows(sql: String): Seq[Row] = { fixtures; context.spearSql(sql).toSeq }
  private def sorted(rs: Seq[Row]): Seq[String] = rs.map(_.toString).sorted

  test("LocalQueryCompilerSuite: query string / mixed / rand (verbatim)") {
    // "query string" (LocalQueryCompilerSuite.scala:44-46)
    assert(rows("SELECT 1 AS a") == Seq(Row(1)))
    // "mixed" (:66-83): people filtered, registered, queried via SQL
    new Context(spark).lift(Person("Alice", 20), Person("Bob", 21), Person("Chris", 22))
      .filter(symbolToColumn(Symbol("age")) =/= 21).asTable("people")
    assert(sorted(rows("SELECT name FROM people")) ==
      sorted(Seq(Row("Alice"), Row("Chris"))))
    assert(sorted(rows("SELECT * FROM people")) ==
      sorted(Seq(Row("Alice", 20), Row("Chris", 22))))
    // "rand" (:216-229) + README.md:92-103: verbatim SQL twin of the DSL
    // form — values are engine-RNG-specific, so the assertion is the
    // reference's own invariant: SQL result ≡ DataFrame-API result
    context.range(10).asTable("t")
    val viaSql = rows(
      """SELECT *
        |FROM (
        |  SELECT id AS key, CAST(RAND(42) * 100 AS INT) AS value
        |  FROM t
        |) s
        |WHERE value % 2 = 0
        |ORDER BY value DESC
        |""".stripMargin)
    val viaDsl = context.table("t")
      .select('id as 'key, (rand(42) * 100) cast types.IntType as 'value)
      .where('value % 2 === 0)
      .orderBy('value.desc)
      .toSeq
    assert(viaSql == viaDsl && viaSql.nonEmpty)
  }

  test("BasicExample.scala SQL (verbatim): filter-project and group-having") {
    new Context(spark).lift(
      GPerson("Alice", "F", 20), GPerson("Bob", "M", 21), GPerson("Chris", "M", 22),
      GPerson("Dave", "M", 17), GPerson("Eve", "F", 16), GPerson("Frank", "M", 19))
      .asTable("people")
    assert(sorted(rows(
      """SELECT name, gender
        |FROM people
        |WHERE age >= 18
        |""".stripMargin)) ==
      sorted(Seq(Row("Alice", "F"), Row("Bob", "M"), Row("Chris", "M"),
        Row("Frank", "M"))))
    assert(rows(
      """SELECT gender, max(age), count(*)
        |FROM people
        |GROUP BY gender
        |HAVING gender = 'M'
        |""".stripMargin) == Seq(Row("M", 22, 4L)))
  }

  test("parser-suite corpus: projections, filters, sorts (verbatim, executed)") {
    assert(rows("SELECT 1") == Seq(Row(1)))
    assert(rows("SELECT 1 AS a FROM t0").size == 5)
    assert(rows("SELECT * FROM t0").size == 5)
    assert(rows("SELECT t0.* FROM t0").size == 5)
    assert(rows("SELECT a.* FROM t0 a").size == 5)
    assert(sorted(rows("SELECT a FROM t0 WHERE a > 10")) == Nil)
    assert(rows("SELECT * FROM t0 ORDER BY a").map(_.get(1)).take(1) == Seq("n"))
    assert(rows("SELECT * FROM t0 ORDER BY a ASC").last.get(1) == "z")
    assert(rows("SELECT * FROM t0 ORDER BY a ASC NULLS FIRST").head.get(1) == "n")
    assert(rows("SELECT * FROM t0 ORDER BY a ASC NULLS LAST").last.get(1) == "n")
    assert(rows("SELECT * FROM t0 ORDER BY a DESC").head.get(1) == "z")
    assert(rows("SELECT * FROM t0 ORDER BY a DESC NULLS FIRST").head.get(1) == "n")
    assert(rows("SELECT * FROM t0 ORDER BY a DESC NULLS LAST").last.get(1) == "n")
    assert(rows("SELECT * FROM t0 WHERE a > 0 ORDER BY a").size == 4)
    assert(rows("SELECT DISTINCT a FROM t0 WHERE a > 10") == Nil)
  }

  test("parser-suite corpus: joins (verbatim, executed)") {
    assert(rows("SELECT * FROM t0, t1").size == 15)
    assert(rows("SELECT * FROM t0 JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 INNER JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 LEFT JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 LEFT OUTER JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 RIGHT OUTER JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 FULL JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 FULL OUTER JOIN t1").size == 15)
    assert(rows("SELECT * FROM t0 INNER JOIN t1 ON t0.a = t1.a").size == 3)
    assert(rows("SELECT * FROM t0 a JOIN t1 b").size == 15)
    assert(rows("SELECT a.* FROM t0 a JOIN t1 b").size == 15)
    assert(rows("SELECT t.a FROM (SELECT * FROM t0) t").size == 5)
  }

  test("parser-suite corpus: set ops — spear INTERSECT/EXCEPT are BAG ops") {
    assert(sorted(rows("SELECT 1 AS a UNION ALL SELECT 2 AS a")) ==
      sorted(Seq(Row(1), Row(2))))
    assert(sorted(rows(
      "(SELECT 1 AS a ORDER BY a) UNION ALL (SELECT 2 AS a ORDER BY a)")) ==
      sorted(Seq(Row(1), Row(2))))
    assert(sorted(rows(
      "(SELECT 1 AS a ORDER BY a LIMIT 1) UNION ALL (SELECT 2 AS a ORDER BY a LIMIT 1)")) ==
      sorted(Seq(Row(1), Row(2))))
    // reference executes Seq.intersect / Seq.diff (spear-local
    // basicOperators.scala:61-76): min-multiplicity and multiset
    // difference — (1,x) appears twice in t0, once in t1
    assert(sorted(rows("SELECT * FROM t0 INTERSECT SELECT * FROM t1")) ==
      sorted(Seq(Row(1, "x"), Row(2, "y"))))
    assert(sorted(rows("SELECT * FROM t0 EXCEPT SELECT * FROM t1")) ==
      sorted(Seq(Row(1, "x"), Row(3, "z"), Row(null, "n"))))
  }

  test("parser-suite corpus: aggregates, HAVING, count DISTINCT (verbatim)") {
    assert(rows("SELECT count(a) FROM t0") == Seq(Row(4L)))
    assert(sorted(rows("SELECT count(a) FROM t0 GROUP BY b")).size == 4)
    assert(rows("SELECT count(a) FROM t0 GROUP BY b HAVING count(b) > 0").size == 4)
    assert(rows(
      "SELECT count(a) FROM t0 GROUP BY b ORDER BY count(b) ASC NULLS FIRST").size == 4)
    // dialect delta (documented): spear turns ORDER BY over an aggregate
    // with a non-aggregate select list into a GLOBAL aggregate
    // (DirectlyExecutableStatementParserSuite: `select 1 orderBy
    // 'count(1)`); Spark's analyzer rejects aggregate functions in a Sort
    // over a non-aggregated child. The spear-semantic result is the
    // explicit global-aggregate spelling, asserted alongside.
    intercept[org.apache.spark.sql.AnalysisException] {
      rows("SELECT 1 FROM t0 ORDER BY count(1)")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      rows("SELECT 1 FROM t0 ORDER BY count(a)")
    }
    assert(rows("SELECT 1 FROM t0 GROUP BY 'all' ORDER BY count(1)") == Seq(Row(1)))
    assert(rows("SELECT 1 FROM t0 HAVING count(1) > 1") == Seq(Row(1)))
    assert(rows("SELECT 1 FROM t0 HAVING count(a) > 1") == Seq(Row(1)))
    assert(rows("SELECT count(DISTINCT a) FROM t0") == Seq(Row(3L)))
  }

  test("parser-suite corpus: CTEs and windows (verbatim)") {
    assert(rows("WITH c0 AS (SELECT 1) SELECT * FROM c0") == Seq(Row(1)))
    assert(rows("WITH c0 (n) AS (SELECT 1) SELECT * FROM c0") == Seq(Row(1)))
    assert(sorted(rows(
      "WITH c0 AS (SELECT 1), c1 AS (SELECT 2) SELECT * FROM c0 UNION ALL SELECT * FROM c1")) ==
      sorted(Seq(Row(1), Row(2))))
    assert(rows("SELECT count(a) OVER () FROM t0").map(_.getLong(0)).toSet == Set(4L))
    assert(rows("SELECT count(a) OVER w0 FROM t0 WINDOW w0 AS ()")
      .map(_.getLong(0)).toSet == Set(4L))
    // dialect delta (documented): spear lets one named window extend
    // another — `WINDOW w0 AS (), w1 AS (w0 ROWS UNBOUNDED PRECEDING)`
    // (DirectlyExecutableStatementParserSuite:250-257). Spark's grammar
    // has no window inheritance; the flattened spelling is equivalent.
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      rows("SELECT count(a) OVER w1 FROM t0 WINDOW w0 AS (), w1 AS (w0 ROWS UNBOUNDED PRECEDING)")
    }
    assert(rows(
      "SELECT count(a) OVER w1 FROM t0 WINDOW w1 AS (ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
      .size == 5)
  }

  test("value-expression corpus: ^ is POWER; precedence is a documented delta") {
    // ValueExpressionParserSuite: "a ^ b" → Power — holds verbatim:
    assert(rows("SELECT 2 ^ 3 AS p") == Seq(Row(8.0d)))
    // "a + b * c ^ d" → a + (b * (c ^ d)) in spear (^ binds TIGHTEST);
    // Spark's grammar puts ^ BELOW +/*, and the spearSql rewrite is
    // plan-level (parse-precedence is Spark's — parenthesization is
    // erased in the AST, so no post-parse rewrite can recover spear's
    // grouping). Delta documented in Context.spearSql: the mixed chain
    // groups as (1 + 2·2) ^ 3 = 125; the parenthesized spelling recovers
    // the spear value.
    assert(rows("SELECT 1 + 2 * 2 ^ 3 AS p") == Seq(Row(125.0d)))
    assert(rows("SELECT 1 + 2 * (2 ^ 3) AS p") == Seq(Row(17.0d)))
  }
}
