package graft

/** End-to-end smoke over the driver contract: every SparkEntry query runs at
  * sf0.001, the flagship entry returns rows, and the oracle map is
  * consistent with the query map (the driver hash-compares per key). */
class QueriesSpec extends SparkTestBase {

  // fast fail on testdata/schema drift: force ANALYSIS (no execution) of
  // every declared query up front — seconds of runtime, so a regenerated
  // parquet vintage (e.g. events.ts arriving as TIMESTAMP_NTZ, round 9/10)
  // surfaces in the first moments of every `sbt test`, not 10 minutes in.
  test("all declared queries analyze at sf0.001") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(bad.isEmpty, s"${bad.size} queries fail analysis:\n${bad.mkString("\n")}")
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle (hash-family operators via recall gates)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  // every query executes and produces a sane schema; most must be non-empty
  private val mayBeEmptyAtSf0001 = Set("q08_except", "q15_join_anti",
    "q20_agg_having", "q17_self_join", "e04_embedding_neardup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmptyAtSf0001(name)) assert(n > 0, s"$name returned 0 rows")
      // a query may RETURN a checkpointed frame (its one allowed cached
      // block); release it the way a caller would, so the suite-wide leak
      // gate below only sees blocks a query abandoned internally
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ =>
      }
    }
  }

  // Runs after every per-query test above (ScalaTest preserves registration
  // order). Any surviving block is a cache/checkpoint some query persisted
  // internally and never released — exactly the state that accumulates
  // across a 100+-query Bench/Verify run and turns into memory pressure.
  test("no persistent RDDs leak across the full query suite") {
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"leaked persistent RDDs: ${leaked.values.map(_.name).mkString(", ")}")
  }
}
