package graft
import org.apache.spark.sql.SparkSession

/** Targeted A/B measurement of a few SparkEntry queries with the SAME
  * methodology as the full Bench (gc+settle boundary before every timed
  * rep, min-of-N): without the boundary, the previous rep's async block
  * release steals cores from the next rep and the spread swamps real
  * deltas (the round-8 isolation lesson Bench codifies).
  * Usage: run_main.sh graft.MiniBench <query> [query ...] */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("MINI_REPS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.cleaner.periodicGC.interval", "900s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val names = args.toSeq
    // warm each once at the smallest SF (codegen/JIT), then once at the
    // target SF (memoized setup + target-SF plan shapes)
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    // Interleaved A/B of a runtime SQL conf within ONE JVM (strongest
    // box-noise control): MINI_AB_CONF="spark.sql.x=v1|v2" alternates the
    // conf per rep and reports min per side.
    val ab = sys.env.get("MINI_AB_CONF").map { s =>
      // r20 advice: a missing '=' threw an opaque MatchError
      s.split("=", 2) match {
        case Array(k, vs) if vs.nonEmpty => (k, vs.split("\\|"))
        case _ => sys.error(
          s"MINI_AB_CONF must be <conf.key>=<v1>|<v2>[|...], got: $s")
      }
    }
    for (n <- names) {
      ab match {
        case Some((key, vals)) =>
          // restore the SESSION-BUILDER value afterwards, not the Spark
          // default (r20 advice: unset reverted e.g. the 128k
          // minPartitionSize to 1m for the rest of the JVM)
          val saved = spark.conf.getOption(key)
          val best = Array.fill(vals.length)(Double.MaxValue)
          for (r <- 1 to reps; (v, i) <- vals.zipWithIndex) {
            spark.conf.set(key, v)
            System.gc()
            Thread.sleep(150)
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, sfDir).count()
            best(i) = math.min(best(i), (System.nanoTime() - t0) / 1e9)
          }
          saved match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
          println(f"[mini] $n AB $key: " + vals.zip(best)
            .map { case (v, b) => f"$v=$b%.3f" }.mkString("  "))
        case None =>
          var best = Double.MaxValue
          val all = (1 to reps).map { _ =>
            System.gc()
            Thread.sleep(150)
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            best = math.min(best, dt)
            dt
          }
          println(f"[mini] $n min=$best%.3f s  reps=" +
            all.map(d => f"$d%.3f").mkString(","))
      }
    }
    spark.stop()
  }
}
