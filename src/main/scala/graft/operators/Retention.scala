package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention analytics over an event stream — "of the users
  * first seen in week W, how many came back in week W+k?" — the
  * longitudinal companion to [[Funnel]]'s per-user ordering report.
  *
  * Shape: one per-user min (the cohort assignment), one distinct over
  * (user, period), one user-key equi-join between them (co-partitioned
  * — both sides shuffle on the same key), then a tiny
  * (cohort, offset) aggregation whose cardinality is bounded by the
  * square of the number of periods in the dataset, NOT by users or
  * events. The offset-0 denominators ride a broadcast. No window over
  * any per-user ordering, so user count and history length scale out.
  */
object Retention {

  /** Nanoseconds per week — the default cohort period. */
  val WeekNs: Long = 7L * 24 * 3600 * 1000000000L

  /** The retention triangle: one row per (cohort period, offset) with
    * the distinct returning users and retention vs the cohort's size in
    * integer basis points (offset 0 is by construction the cohort size:
    * every user is active in their first period).
    *
    * `tsCol` is epoch-nanos (the repo-wide events encoding);
    * `periodNs` buckets it by integer division, so period boundaries
    * are engine-exact.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodNs: Long = WeekNs): DataFrame =
    retentionFromActivity(events.select(col(userCol).as("user_id"),
      expr(s"$tsCol div $periodNs").as("wk")))

  /** The triangle from a raw (user_id, wk) activity stream — the entry
    * point the streaming activity log shares with the batch path. Both
    * aggregations are associative (set union for activity, min for the
    * cohort), which is what makes the incremental form exact.
    */
  def retentionFromActivity(activity: DataFrame): DataFrame = {
    val e = activity.select(col("user_id"), col("wk"))
    val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    // distinct (user, period): each user counts once per active period,
    // so the post-join count(*) IS the distinct-user count
    val active = e.distinct()
    val tri = active.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = tri.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("__b"))
    tri.join(broadcast(base), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        expr("n_users * 10000 div __b").as("retention_bp"))
  }
}
