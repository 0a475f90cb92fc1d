package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming state-partition sizing (optimization r17): stateful
  * streaming rows scope `spark.sql.shuffle.partitions` to
  * [[graft.util.Tuning.streamStatePartitions]] — the bytes-derived rule
  * WITHOUT the batch cpus floor — because every micro-batch pays
  * O(partitions) state-store open/commit cost per stateful operator.
  */
class StatePartitionSizingSpec extends SparkSpec {

  test("streamStatePartitions: bytes-derived, floor 4, no cpus floor") {
    val t = graft.util.Tuning
    // sf0.1 is ~17.5 MB on disk -> 1 by bytes -> floored at 4, NOT at
    // any core count
    assert(t.streamStatePartitions(sf("0.1")) === 4)
    assert(t.streamStatePartitions(sf("0.01")) === 4)
    // missing dir -> 0 bytes -> still the floor
    assert(t.streamStatePartitions("/nonexistent") === 4)
    // from sf10 up byBytes exceeds any local core count, so the state
    // rule and the batch rule agree — at-scale posture unchanged: both
    // are ceil(legBytes / 64MB)
    val byBytes = ((t.legBytes(sf("0.1")) + t.BytesPerPartition - 1) /
      t.BytesPerPartition).toInt
    assert(byBytes <= 4, "sf0.1 fixture grew past the floor; revisit")
  }

  test("streaming catalog query restores the session's batch partition conf") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "13")
    // the sizing must scope the CALLER's session (ADVICE r17: the old
    // SparkSession.active plumbing mutated whatever session happened to
    // be active and the restore assertion passed vacuously) — pin the
    // active session to a sentinel and prove it is never touched
    val activePrev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "17")
    // run a stateful streaming catalog row end-to-end under the scoped
    // sizing; the session conf must come back to the batch value
    val out =
      try {
        val o = graft.queries.Queries.ev3_stream_window(s2, sf("0.001"))
        assert(o.count() > 0)
        assert(s2.conf.get("spark.sql.shuffle.partitions") === "13",
          "withStreamStatePartitions must restore the caller session's conf")
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "17",
          "withStreamStatePartitions must not mutate a session it was not given")
        o
      } finally spark.conf.set("spark.sql.shuffle.partitions", activePrev)
    // and the streamed result still equals the batch twin (ev1 oracle
    // shape): 5-minute buckets by event_type
    val batch = StreamingOps.readEventsBatch(s2, sf("0.001") + "/events.parquet")
      .groupBy(expr("ts div 300000000000").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val got = out.select("bucket", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = batch.collect().map(_.toSeq).toSet
    assert(got === want, "state-partition sizing must not change results")
  }
}
