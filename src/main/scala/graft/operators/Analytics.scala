package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention — the
  * two workhorse product-analytics operators over an events table. Both
  * are pure relational compositions (joins + partial-aggregating hash
  * aggs keyed on the user), so they shuffle user-sized state only and
  * scale with the events volume, never a cross product.
  */
object Analytics {

  /** Strict ordered funnel: for each user, step i qualifies at the
    * earliest `steps(i)`-event whose timestamp is STRICTLY after the
    * user's step i-1 qualifying time. Emits one row per step:
    * (step, event_type, users = count of users reaching it).
    *
    * Formulated as one aggregation per step joined back on the user key —
    * timestamp comparisons only (no window-frame row ordering), so ties
    * in event time cannot make results depend on row order, and every
    * aggregation combines map-side. The user-key shuffle is reused across
    * steps (same partitioning; AQE reuses the exchange). */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // chain of per-user qualifying times, built LAZILY — one plan, one
    // action; union branches share the step-(i-1) subtree and Spark's
    // exchange reuse computes it once
    val reachedFrames = steps.zipWithIndex.tail.scanLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))) {
      case (prev, (s, _)) =>
        events.filter(col(typeCol) === s)
          .join(prev, col(userCol) === col("u") && col(tsCol) > col("t"))
          .groupBy(events(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    }
    reachedFrames.zip(steps).zipWithIndex.map { case ((reached, s), i) =>
      reached.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(s).as("event_type"), col("users"))
    }.reduce(_.unionAll(_))
  }

  /** Cohort retention: users are cohorted by the DATE of their first
    * event; each (cohort_day, age_days) cell counts the distinct users of
    * that cohort active `age_days` days later. Two user-keyed hash
    * aggregations — first-seen, then distinct activity — both partial
    * map-side. Output: (cohort_day, age_days, active_users). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol).as("u"))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    events.select(col(userCol), to_date(col(tsCol)).as("day"))
      .join(firstSeen, col(userCol) === col("u"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("age_days"))
      .agg(count_distinct(col(userCol)).as("active_users"))
  }
}
