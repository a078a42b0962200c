package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic summary-table (materialized-view) maintenance: merge a delta
  * roll-up into the MV state with the same partial-aggregate algebra the
  * MV was built with — the glue that keeps [[graft.plans.MvRewrite]]'s
  * aggregate navigation fresh without rescanning the base corpus.
  *
  * [[IncrementalAgg]] pins one concrete state schema (count/sum/max over a
  * single value column); this generalizes the merge to ANY measure set a
  * registered MV carries: "sum"-rollup columns add (count partials are
  * long sums; decimal sums are exact and order-independent), "min"/"max"
  * are semilattices. The merge is a 1:1 full-outer join on the MV group
  * keys — both sides are key-unique roll-ups — so a refresh costs
  * O(delta + MV), with the MV bounded by group-key cardinality, never by
  * the fact table. Append-only deltas by construction (min/max partials
  * cannot retract; see IncrementalAgg's scaladoc for the trade-off).
  *
  * Merged measure columns are cast back to the state's column types, so
  * refresh(state, delta) has EXACTLY the state's schema and the result is
  * bit-identical to rebuilding the MV from the unioned input — the
  * property MvSpec asserts, and the reason a maintained MV can keep
  * serving [[graft.plans.MvRewrite]] rewrites without re-registration.
  */
object MvMaintain {

  /** Merge two key-unique roll-ups sharing one schema. `rollups` maps each
    * measure column to its merge function: "sum" | "min" | "max". */
  def merge(
      state: DataFrame, delta: DataFrame,
      keys: Seq[String], rollups: Map[String, String]): DataFrame = {
    val stateTypes = state.schema.fields.map(f => f.name -> f.dataType).toMap
    // preserve the state's column order — refresh output IS the new state
    val measureCols = state.schema.fieldNames.filter(rollups.contains).toSeq
    require(measureCols.toSet == rollups.keySet,
      s"rollup columns ${rollups.keySet -- measureCols} missing from the state")
    val merged: Seq[Column] = measureCols.map { m =>
      val (s, d) = (col(s"s.$m"), col(s"d.$m"))
      val c = rollups(m) match {
        // full-outer: a key absent on one side contributes its neutral
        // element for sums; min/max take the present side via least/greatest
        // null-skipping semantics (both non-null never happens with a null
        // partial: roll-ups of non-null inputs store non-null partials)
        case "sum" => coalesce(s, lit(0)) + coalesce(d, lit(0))
        case "min" => least(s, d)
        case "max" => greatest(s, d)
        case other => throw new IllegalArgumentException(s"rollup $other")
      }
      c.cast(stateTypes(m)).as(m)
    }
    state.as("s").join(delta.as("d"), keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }
}
