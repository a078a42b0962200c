package graft.tools

import java.nio.file.Files

/** Interactive shell mirroring the reference's spear-repl module (an
  * Ammonite REPL with a pre-wired context, reference build.sbt:1-9 and
  * spear-repl/): delegates to Spark's own REPL (spark-repl is on the
  * unmanaged classpath) with the graft facade pre-imported and a `context`
  * bound, so reference-style sessions —
  * `context.range(10).select('id as 'key).show()` — work at the prompt.
  *
  * Usage: scripts/run_main.sh graft.tools.Repl
  */
object Repl {
  def main(args: Array[String]): Unit = {
    if (sys.props.get("spark.master").isEmpty)
      sys.props("spark.master") = "local[8]"
    sys.props.getOrElseUpdate("spark.sql.shuffle.partitions", "8")
    sys.props.getOrElseUpdate("spark.ui.enabled", "false")
    val predef = Files.createTempFile("graft_predef", ".scala")
    Files.writeString(predef,
      """import org.apache.spark.sql.functions._
        |import graft.api._
        |import graft.api.types._
        |graft.functions.GraftFunctions.register(spark)
        |val context = new graft.api.Context(spark)
        |println("graft> `context` bound (sql / spearSql / table / lift / values / range); graft functions registered")
        |""".stripMargin)
    org.apache.spark.repl.Main.main(Array("-I", predef.toString) ++ args)
  }
}
