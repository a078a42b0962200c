package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-wide wiring for the graft surface:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs the custom function registry ([[graft.functions.GraftFunctions]]
  * — sketch aggregates, vector/hash kernels, normalization, reference
  * shims) and the MV navigation optimizer rule
  * ([[graft.plans.MvRewrite]]) into EVERY session the cluster creates — no
  * per-session `register()`/`extraOptimizations` calls. This is the
  * production deployment path; the runtime installers remain for notebook
  * and test sessions that already exist.
  *
  * The same builders back both paths, so a function resolves identically
  * whether the session came up through this entry point or through
  * `GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.injectInto(ext)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
  }
}
