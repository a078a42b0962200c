package graft

import graft.api._
import graft.api.types._
import org.apache.spark.sql.Row

/** Facade tests mirroring the reference's end-to-end suites
  * (LocalQueryCompilerSuite, DataFrameSuite, BasicExample) — reference-style
  * code must run unchanged modulo imports. Includes the §7.2 minimum
  * end-to-end slice (README.md:63-115). */
class FacadeSpec extends SparkTestBase {

  private lazy val context = new Context(spark)

  case class Person(name: String, age: Int)

  test("§7.2 flagship slice: range/select/alias/rand/cast/filter/orderBy + SQL twin") {
    val dsl = context.range(10)
      .select('id as 'key, (rand(42) * 100) cast IntType as 'value)
      .where('value % 2 === 0)
      .orderBy('value.desc)
    val rows = dsl.toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) % 2 == 0))
    val values = rows.map(_.getInt(1))
    assert(values == values.sorted.reverse)
    // SQL twin through the same entry point produces the same schema
    val viaSql = context.sql(
      """SELECT id AS key, CAST(rand(42) * 100 AS INT) AS value
        |FROM range(10) WHERE CAST(rand(42) * 100 AS INT) % 2 = 0""".stripMargin)
    assert(viaSql.schema.fieldNames.toSeq == dsl.schema.fieldNames.toSeq)
  }

  test("explainSpear: reference section headers over Spark's four stages (golden)") {
    val df = context.lift(Seq(Person("alice", 30), Person("bob", 40)))
      .select('name)
    // golden text modulo volatile ids: expr ids (#12) and plan ids vary
    // per session, everything else must render exactly
    def norm(s: String): String = s
      .replaceAll("#\\d+", "#N").replaceAll("plan_id=\\d+", "plan_id=N")
    val got = norm(df.explanationSpear(extended = true))
    val headers = Seq("══ Parsed logical plan ══", "══ Analyzed logical plan ══",
      "══ Optimized logical plan ══", "══ Physical plan ══")
    // all four sections present, in order
    val idxs = headers.map(got.indexOf)
    assert(idxs.forall(_ >= 0) && idxs == idxs.sorted, got)
    // each stage renders its actual plan: the parsed/analyzed stages show
    // the projection, the optimized stage the pruned LocalRelation, the
    // physical stage the executed LocalTableScan
    val sections = got.split("══ [A-Za-z ]+ ══\n").filter(_.nonEmpty)
    assert(sections.length == 4, got)
    assert(sections(0).contains("'Project") || sections(0).contains("Project [name#N]"), got)
    assert(sections(1).startsWith("Project [name#N]"), got)
    assert(sections(2).startsWith("LocalRelation [name#N]"), got)
    assert(sections(3).startsWith("LocalTableScan [name#N]"), got)
    // the short form is the physical section alone
    assert(norm(df.explanationSpear(extended = false)) ==
      "══ Physical plan ══\n" + sections(3))
  }

  test("identifier case sensitivity: delimited identifiers are per-identifier sensitive") {
    // Reference semantics (Name.scala:14-23, IdentifierParser.scala:50-62):
    // unquoted identifiers are case-insensitive, delimited ones
    // case-sensitive. Spark has only the global caseSensitive=false mode,
    // so the facade restores the delimited half post-analysis
    // (Context.checkDelimited): a wrong-case delimited identifier raises
    // the reference's resolution error instead of silently resolving.
    assert(!spark.conf.get("spark.sql.caseSensitive").toBoolean)
    context.lift(Person("a", 1), Person("b", 2))
      .asTable("case_sens_t")
    // unquoted, any case — matches reference semantics
    assert(context.sql("SELECT NAME, aGe FROM case_sens_t").toSeq.length == 2)
    // delimited exact-case — resolves
    assert(context.sql("SELECT `name` FROM case_sens_t").toSeq.length == 2)
    // delimited wrong-case — the reference rejects `NAME` against a column
    // declared as name; so do we now
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      context.sql("SELECT `NAME` FROM case_sens_t")
    }
    assert(e.getMessage.contains("case-sensitive"))
    // wrong case inside a string literal or comment is NOT an identifier
    assert(context.sql(
      "SELECT name AS x, '`NAME`' AS lit FROM case_sens_t -- `AGE`")
      .toSeq.length == 2)
    // delimited table identifiers get the same treatment
    intercept[org.apache.spark.sql.AnalysisException] {
      context.sql("SELECT name FROM `CASE_SENS_T`")
    }
    // spearSql shares the check
    intercept[org.apache.spark.sql.AnalysisException] {
      context.spearSql("SELECT `Name` FROM case_sens_t")
    }
  }

  test("Name shim matrix: unquoted-insensitive, quoted-sensitive (Name.scala:14-23)") {
    // equality matrix, reference semantics exactly
    assert(Name.caseInsensitive("name") == Name.caseInsensitive("NAME"))
    assert(Name.caseSensitive("name") == Name.caseSensitive("name"))
    assert(Name.caseSensitive("name") != Name.caseSensitive("NAME"))
    // one sensitive side forces exact comparison (reference equals, both orders)
    assert(Name.caseSensitive("name") == Name.caseInsensitive("name"))
    assert(Name.caseInsensitive("NAME") != Name.caseSensitive("name"))
    // hash is case-normalized so both kinds coexist in hash collections
    assert(Name.caseSensitive("Ab").hashCode == Name.caseInsensitive("aB").hashCode)
    // surface parsing: "" unescapes inside delimited identifiers
    assert(Name.parse("\"a\"\"b\"") == Name.caseSensitive("a\"b"))
    assert(!Name.parse("plain").isCaseSensitive && Name.parse("\"q\"").isCaseSensitive)
    // toString round-trips the delimited form
    assert(Name.parse(Name.caseSensitive("a\"b").toString) == Name.caseSensitive("a\"b"))
    // qualified names (reference Name.scala:3-10 withNamespace): namespaces
    // compare exactly and never case-fold; case rules on the base name are
    // unchanged within a namespace; toString appends @namespace
    val qualified = Name.caseInsensitive("name").withNamespace("t")
    assert(qualified == Name.caseInsensitive("NAME").withNamespace("t"))
    assert(qualified != Name.caseInsensitive("name"))
    assert(qualified != Name.caseInsensitive("name").withNamespace("T"))
    assert(Name.caseSensitive("name").withNamespace("t") != qualified.withNamespace("u"))
    assert(qualified.toString == "name@t")
    assert(qualified.hashCode == Name.caseInsensitive("name").hashCode)

    // facade resolution through the shim
    val people = context.lift(Person("a", 1), Person("b", 2))
    assert(people.select(people.col("NAME")).schema.fieldNames.sameElements(Array("name")))
    assert(people.select(people.col("\"name\"")).toSeq.length == 2)
    val wrongCase = intercept[IllegalArgumentException](people.col("\"NAME\""))
    assert(wrongCase.getMessage.contains("no column matching"))
    val missing = intercept[IllegalArgumentException](people.col("nope"))
    assert(missing.getMessage.contains("no column matching"))
    // ambiguity: an any-case regular identifier over twin columns errors,
    // a delimited identifier picks its exact twin
    val twins = people.select(people.col("age") as "x", (people.col("age") * 2) as "X")
    assert(intercept[IllegalArgumentException](twins.col("x"))
      .getMessage.contains("ambiguous"))
    assert(twins.select(twins.col("\"X\"")).toSeq.map(_.getInt(0)).sorted == Seq(2, 4))
  }

  test("spearSql parses ^ as POWER; plain sql keeps Spark's XOR (dialect delta)") {
    val pow = context.spearSql("SELECT 2 ^ 10 AS p").toSeq.head
    assert(pow.getDouble(0) == 1024.0) // spear Power returns double
    val xor = context.sql("SELECT 2 ^ 10 AS p").toSeq.head
    assert(xor.getInt(0) == 8) // Spark dialect: bitwise xor
    // ^ inside string literals is untouched by the plan rewrite
    val s = context.spearSql("SELECT 'a^b' AS s, 3 ^ 2 AS p").toSeq.head
    assert(s.getString(0) == "a^b" && s.getDouble(1) == 9.0)
    // the rewrite reaches CTE bodies and subquery expressions too
    val cte = context.spearSql(
      "WITH t AS (SELECT 2 ^ 3 AS x) SELECT x FROM t").toSeq.head
    assert(cte.getDouble(0) == 8.0)
    val sub = context.spearSql(
      "SELECT (SELECT 2 ^ 5) AS y").toSeq.head
    assert(sub.getDouble(0) == 32.0)
  }

  test("lift case classes + groupBy/having/orderBy/agg (BasicExample.scala:7-49)") {
    val people = context.lift(
      Person("Alice", 20), Person("Bob", 21), Person("Chris", 22),
      Person("Dan", 20), Person("Eve", 21), Person("Frank", 21))
    val byAge = people
      .groupBy('age)
      .having(count('name) > 1)
      .orderBy('age.asc)
      .agg(count('name) as 'n)
      .toSeq
    assert(byAge == Seq(Row(20, 2L), Row(21, 3L)))
  }

  test("lifted tuples + rename (LocalQueryCompilerSuite.scala:15-21)") {
    val df = context.lift(Seq((1, "a"), (2, "b"))).rename('i, 's)
    assert(df.schema.fieldNames.toSeq == Seq("i", "s"))
    assert(df.toSeq.toSet == Set(Row(1, "a"), Row(2, "b")))
  }

  test("self-join via subquery aliases (LocalQueryCompilerSuite self-join over a.id)") {
    val t = context.range(3)
    val joined = (t subquery 'a) join (t subquery 'b) on ($"a.id" === $"b.id")
    assert(joined.toSeq.size == 3)
  }

  test("all join types execute (reference cannot run outer joins — NotImplemented)") {
    val li = context.lift(Seq((1, "a"), (2, "b"))).rename('lk, 'v)
    val ri = context.lift(Seq((2, "x"), (3, "y"))).rename('rk, 'w)
    assert((li join ri).on('lk === 'rk).toSeq.size == 1)
    assert((li leftJoin ri).on('lk === 'rk).toSeq.size == 2)
    assert((li rightJoin ri).on('lk === 'rk).toSeq.size == 2)
    assert((li outerJoin ri).on('lk === 'rk).toSeq.size == 3)
    assert((li semiJoin ri).on('lk === 'rk).toSeq.size == 1)
    assert((li antiJoin ri).on('lk === 'rk).toSeq.size == 1)
    assert((li crossJoin ri).toSeq.size == 4)
  }

  test("union aligns by widest type (LogicalPlan.scala:214-238)") {
    val ints = context.lift(Seq(Tuple1(1), Tuple1(2))).rename('x)
    val doubles = context.lift(Seq(Tuple1(2.5))).rename('x)
    val u = ints.union(doubles)
    assert(u.schema.fields.head.dataType == DoubleType)
    assert(u.toSeq.map(_.getDouble(0)).toSet == Set(1.0, 2.0, 2.5))
    // int + string -> string (anything widens to string implicitly)
    val strs = context.lift(Seq(Tuple1("s"))).rename('x)
    assert(ints.union(strs).schema.fields.head.dataType == StringType)
  }

  test("union requires equal column names") {
    val a = context.lift(Seq(Tuple1(1))).rename('x)
    val b = context.lift(Seq(Tuple1(1))).rename('y)
    intercept[IllegalArgumentException](a.union(b))
  }

  test("intersect / except") {
    val a = context.lift(Seq(Tuple1(1), Tuple1(2), Tuple1(3))).rename('x)
    val b = context.lift(Seq(Tuple1(2), Tuple1(3), Tuple1(4))).rename('x)
    assert(a.intersect(b).toSeq.map(_.getInt(0)).sorted == Seq(2, 3))
    assert(a.except(b).toSeq.map(_.getInt(0)) == Seq(1))
  }

  test("windowSpec pins spear's ROWS default frame (WindowSpec.scala:78-82)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, sum => fsum}
    // ordering key with a tie: ROWS gives a strictly-growing running sum,
    // Spark's ordered default (RANGE) lumps tied rows into one frame
    val df = context.lift(Seq((1, 10), (1, 20), (2, 30))).rename('k, 'v).df
    val rows = df.select(fsum(col("v")).over(
        windowSpec(Nil, Seq(col("k")))).as("run"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(10L, 30L, 60L) || rows.toSeq == Seq(20L, 30L, 60L))
    val range = df.select(fsum(col("v")).over(
        Window.orderBy(col("k"))).as("run"))
      .collect().map(_.getLong(0)).sorted
    assert(range.toSeq == Seq(30L, 30L, 60L)) // the delta windowSpec avoids
  }

  test("intersect / except keep bag multiplicity (Seq.intersect/diff, basicOperators.scala:69,75)") {
    val a = context.lift(Seq(Tuple1(1), Tuple1(1), Tuple1(2), Tuple1(2), Tuple1(3))).rename('x)
    val b = context.lift(Seq(Tuple1(1), Tuple1(2), Tuple1(2), Tuple1(4))).rename('x)
    // Seq(1,1,2,2,3) intersect Seq(1,2,2,4) == Seq(1,2,2): min count per row
    assert(a.intersect(b).toSeq.map(_.getInt(0)).sorted == Seq(1, 2, 2))
    // Seq(1,1,2,2,3) diff Seq(1,2,2,4) == Seq(1,3): one removal per occurrence
    assert(a.except(b).toSeq.map(_.getInt(0)).sorted == Seq(1, 3))
  }

  test("values / one-row relation (Context.scala:18-20)") {
    val v = context.values(lit(1) as 'a, lit("x") as 'b).toSeq
    assert(v == Seq(Row(1, "x")))
  }

  test("asTable + table round-trip (Catalog.scala:18-33)") {
    context.range(5).asTable('t_facade)
    assert(context.table('t_facade).toSeq.size == 5)
    assert(context.sql("SELECT count(*) AS n FROM t_facade").toSeq.head.getLong(0) == 5L)
  }

  test("reference function semantics through the DSL: product/array_agg/first/last") {
    val df = context.lift(Seq(
      ("g", Some(2.0)), ("g", None), ("g", Some(4.0))
    )).rename('k, 'v)
    val r = df.groupBy('k).agg(
      product('v) as 'p,
      first('v) as 'f,
      last('v) as 'l).toSeq.head
    assert(r.getDouble(1) == 8.0)
    assert(r.getDouble(2) == 2.0) // ignoreNulls default true
    assert(r.getDouble(3) == 4.0)
  }

  test("power operator ^ and =/= (ValueExpressionParser power; comparisons)") {
    val r = context.values((lit(2) ^ 10) as 'p, (lit(1) =/= lit(2)) as 'ne).toSeq.head
    assert(r.getDouble(0) == 1024.0)
    assert(r.getBoolean(1))
  }

  test("explain/show/showSchema do not throw (DataFrame.scala:96-127)") {
    val df = context.range(3).select('id as 'x)
    df.explain()
    df.explainExtended()
    df.showSchema()
    assert(df.iterator.size == 3)
  }
}
