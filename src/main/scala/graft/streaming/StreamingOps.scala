package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is pure batch (SURVEY.md
  * §2.8), so this is greenfield: the events table drives the same
  * relational operators in micro-batch. Watermarked windowed
  * aggregation for the declarative path; mapGroupsWithState for custom
  * session state the window model can't express.
  */
object StreamingOps {

  /** events.parquet schema with ts as epoch-nanos long (the
    * nanosAsLong reading used engine-wide).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Micro-batch source over events parquet (path or glob — it must
    * match only events files; a directory of mixed tables would be read
    * with this schema and yield nulls).
    */
  def readEvents(spark: SparkSession, pathOrGlob: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(pathOrGlob)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window aggregation: counts + value sums per
    * (5-minute window, event_type). Late data beyond 10 minutes dropped.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  case class UserEvent(user_id: Long, ts: Long, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState
    * — the KeyValueGroupedDataset stateful path (for semantics windows
    * can't express, e.g. lifetime counters).
    */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }

  /** Run a streaming query to completion against the (static) test
    * parquet via the memory sink; returns the collected result table.
    */
  def runToMemorySink(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
