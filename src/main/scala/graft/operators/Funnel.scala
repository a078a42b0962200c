package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis over event streams — the product-analytics classic.
  *
  * Scale shape: one user-keyed aggregate per funnel step plus one
  * user-keyed join per step transition — everything is keyed by the
  * user, so a funnel over N steps is N shuffles on the SAME key (an
  * engine reusing the partitioning pays one), and no step ever
  * materializes more than (user, timestamp) pairs.
  */
object Funnel {

  /** First-touch funnel: per user, step 1 anchors at the EARLIEST
    * occurrence of `steps.head`, and each later step at the earliest
    * occurrence of its type strictly after the previous step and within
    * `gapMicros` of it. Earliest is the (timestamp, tie) total order —
    * tie must be unique per user so the anchor is deterministic.
    * Returns one row per user who reached step 1: (user_id, t1_us …
    * tN_us, steps_completed), later steps NULL once the funnel breaks
    * (prefix-closed by construction). */
  def firstTouch(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, steps: Seq[String], gapMicros: Long): DataFrame = {
    require(steps.nonEmpty && gapMicros > 0)
    val ev = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("t_us"), col(tieCol).as("__tie"),
      col(typeCol).as("__etype"))
    var acc = ev.filter(col("__etype") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(struct(col("t_us"), col("__tie"))).as("__s"))
      .select(col("user_id"), col("__s.t_us").as("t1_us"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}_us"
      val cur = s"t${i + 2}_us"
      val next = acc
        .join(ev.filter(col("__etype") === st)
          .select(col("user_id"), col("t_us"), col("__tie")),
          Seq("user_id"))
        .filter(col("t_us") > col(prev) &&
          col("t_us") <= col(prev) + gapMicros)
        .groupBy(col("user_id"))
        .agg(min(struct(col("t_us"), col("__tie"))).as("__s"))
        .select(col("user_id"), col("__s.t_us").as(cur))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    acc.withColumn("steps_completed",
      steps.indices.map(i =>
        when(col(s"t${i + 1}_us").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _))
  }
}
