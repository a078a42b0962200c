package graft

import graft.tools.Repl
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The REPL contract (reference spear-repl/Main.scala + predef.scala): a
  * fresh interpreter session boots the predef (context + DSL imports + `%`)
  * and evaluates facade queries. Exercised through the batch transcript
  * runner — same interpreter and predef as the interactive loop, minus the
  * jline front end. */
class ReplSpec extends AnyFunSuite with Matchers {

  test("REPL session: predef boots, facade query and % sql evaluate") {
    val out = Repl.runBatch(Seq(
      """val n = context.range(10).where('id % 2 === 0).toSeq.length""",
      """% sql "SELECT 40 + 2 AS answer"""",
      """context.spark.stop()"""))
    // predef bound a context
    out should include("context: graft.api.Context")
    // the facade DSL query evaluated: 5 even ids in [0, 10)
    out should include("n: Int = 5")
    // the % SQL runner showed its result table
    out should include("answer")
    out should include("42")
    // nothing failed to compile or threw
    out should not include "error:"
    out should not include "Exception"
  }
}
