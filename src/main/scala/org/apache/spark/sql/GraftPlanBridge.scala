package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal bridge into Spark's `private[sql]` plan-to-DataFrame constructor
  * (`Dataset.ofRows`), needed to execute a programmatically rewritten
  * parsed plan — e.g. graft's spear-dialect `^`-as-power rewrite
  * (graft.api.Context.spearSql). Same idiom used by frameless and other
  * public Spark libraries that build logical plans directly; contains no
  * logic of its own. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
