package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ev29 (stream-stream join → windowed agg, the bounded-output scale
  * twin of ev9): the chained-stateful streamed result must equal the
  * FULL batch computation — the sentinel file pushes the final
  * watermark past every real window, so no watermark-truncation slack
  * is tolerated here (unlike the append-mode specs that accept
  * unclosed trailing windows).
  */
class Ev29Spec extends SparkSpec {

  test("ev29 streamed join+agg equals the batch join+agg, all windows flushed") {
    val streamed = graft.queries.Queries
      .ev29_stream_join_agg(spark, sf("0.001"))

    val ev = StreamingOps
      .readEventsBatch(spark, sf("0.001") + "/events.parquet")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val batch = p.join(c,
        p("user_id") === c("c_uid") &&
          expr("c_ts div 1000 <= p_ts div 1000") &&
          expr("c_ts div 1000 >= p_ts div 1000 - 1800000000"))
      .groupBy(expr("(p_ts div 1000) div 1800000000 * 1800000000").as("win_us"),
        col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("(p_ts div 1000) - (c_ts div 1000)")).as("sum_gap_us"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.select("win_us", "user_id", "n_pairs", "sum_gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val s = rows(streamed)
    val b = rows(batch)
    assert(s.nonEmpty)
    assert(s == b, s"streamed-only: ${(s -- b).take(3)}; batch-only: ${(b -- s).take(3)}")
    // the sentinel user must not leak into the result
    assert(!s.exists(_._2 == -1L))
  }
}
