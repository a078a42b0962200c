package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug probe for the s17 heavy-hitter gate: builds the same planted
  * term stream in batch, inspects the sketch report vs exact counts. */
object FreqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{freqAgg, freqItems, freqMaxError}
    {
      // pure JVM: no Spark in the loop
      val sk = new org.apache.datasketches.frequencies.ItemsSketch[String](32)
      (0 until 100000).foreach(i => sk.update("t" + (i % 1500)))
      val rows = sk.getFrequentItems(
        org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      println(s"[freq] PURE maxerr=${sk.getMaximumError} nItems=${rows.length} streamLen=${sk.getStreamLength}")
      val ser = sk.toByteArray(new org.apache.datasketches.common.ArrayOfStringsSerDe)
      val sk2 = org.apache.datasketches.frequencies.ItemsSketch.getInstance(
        org.apache.datasketches.memory.Memory.wrap(ser),
        new org.apache.datasketches.common.ArrayOfStringsSerDe)
      println(s"[freq] PURE-roundtrip maxerr=${sk2.getMaximumError} streamLen=${sk2.getStreamLength}")
    }
    for (parts <- Seq(1, 2, 8); n <- Seq(20000, 100000)) {
      val syn = spark.range(0, n).repartition(parts)
        .select(lit("g").as("k"), concat(lit("t"), col("id") % 1500).as("term"))
        .groupBy("k").agg(freqAgg(col("term"), 32).as("sk"))
        .select(freqMaxError(col("sk")).as("me"), size(freqItems(col("sk"))).as("ni"))
        .collect().head
      println(s"[freq] SYN n=$n parts=$parts maxerr=${syn.getLong(0)} nItems=${syn.getInt(1)}")
    }
    for (sf <- Seq("0.01", "0.1")) {
      val ev = Tables.events(spark, s"/root/testdata/sf$sf")
      val terms = ev.select(lit("g").as("k"),
          concat(lit("u"), col("user_id")).as("term"))
        .unionAll(ev.filter(pmod(col("event_id"), lit(50)) === 0)
          .select(lit("g").as("k"),
            explode(array_repeat(concat(lit("hot_"),
              pmod(expr("event_id div 50"), lit(2))), 200)).as("term")))
      val bgOnly = ev.select(lit("g").as("k"),
          concat(lit("u"), col("user_id")).as("term"))
        .groupBy("k").agg(freqAgg(col("term"), 32).as("sk"))
        .select(freqMaxError(col("sk")).as("me"), size(freqItems(col("sk"))).as("ni"))
        .collect().head
      println(s"[freq] sf$sf BG-ONLY maxerr=${bgOnly.getLong(0)} nItems=${bgOnly.getInt(1)}")
      val sk = terms.groupBy("k").agg(freqAgg(col("term"), 32).as("sk"))
        .select(freqItems(col("sk")).as("items"),
          freqMaxError(col("sk")).as("maxerr"))
        .collect().head
      val maxerr = sk.getLong(1)
      val items = sk.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      println(s"[freq] sf$sf maxerr=$maxerr nItems=${items.size}")
      items.sortBy(-_._2).take(6).foreach(t => println(s"[freq]   $t"))
    }
    spark.stop()
  }
}
