package graft

import org.apache.spark.sql.functions._

/** Source/sink formats and physical-layout levers beyond the oracle-gated
  * parquet path: CSV/JSON roundtrips with explicit schemas, and bucketed
  * tables — the pre-partitioning that makes repeated big joins
  * exchange-free at cluster scale (the brief's "bucketing for co-located
  * joins"). The reference has no sources or sinks at all (SURVEY §2.3), so
  * all of this is capability surplus. */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"lang", $"n_chars")

  test("csv roundtrip with explicit schema preserves rows and types") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(tmp)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(tmp)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("json roundtrip with explicit schema preserves rows and types") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(tmp)
    val back = spark.read.schema(docs.schema).json(tmp)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("bucketed tables: co-located equi-join plans without a shuffle exchange") {
    val left = spark.range(0, 1000).select($"id".as("k"), ($"id" * 3).as("a"))
    val right = spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("b"))
    val d1 = java.nio.file.Files.createTempDirectory("graft_b1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_b2").toString
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", d1).saveAsTable("graft_bl")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", d2).saveAsTable("graft_br")
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
        assert(joined.count() == 1000)
        val plan = joined.queryExecution.executedPlan.toString
        // both sides arrive pre-partitioned on k: a sort-merge join with NO
        // Exchange anywhere — the plan shape a 100 TB fact-fact join needs
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), plan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bl")
      spark.sql("DROP TABLE IF EXISTS graft_br")
    }
  }

  test("unbucketed control: the same join does shuffle both sides") {
    val left = spark.range(0, 1000).select($"id".as("k"), ($"id" * 3).as("a"))
    val right = spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("b"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = left.join(right, "k")
      assert(joined.count() == 1000)
      assert(joined.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
