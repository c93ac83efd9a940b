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

  /** Sliding (hopping) window counts + value sums per event type: window
   * `windowDur` advancing every `slideDur` — each event contributes to
   * windowDur/slideDur overlapping windows (the rate-monitoring view a
   * tumbling window can't give). Same batch ≡ streaming plan contract as
   * [[windowedCounts]]; state per key is bounded by windowDur/slideDur
   * concurrent windows under the watermark. */
  def slidingCounts(events: DataFrame,
                    windowDur: String = "1 hour",
                    slideDur: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), round(col("total_value"), 6).as("total_value"))
  }

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
  // not `private`: these are state-encoder types — the codegen'd
  // deserializer constructs them reflectively from generated Java, which
  // cannot see private nested classes
  final case class SessionState(start: Long, last: Long, n: Long, v: Double)
  /** Streaming state: the per-user OPEN sessions (out-of-order arrivals can
   * briefly keep several disjoint intervals open until events or the
   * watermark bridge/close them). */
  final case class OpenSessions(sessions: Seq[SessionState])

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

  /**
   * TRUE streaming sessionization: event-time timeout + out-of-order
   * handling, deployable on an unbounded `readStream` source (the batch
   * [[sessionize]] keeps its exact in-group-sort semantics for bounded
   * frames). Semantics:
   *
   *  - state per user = the set of OPEN sessions as disjoint `[start,last]`
   *    intervals; an arriving event (in any order, across any micro-batch
   *    split) merges every interval within `gapMs` of it — so a late event
   *    that lands between two provisional sessions bridges them into one,
   *    exactly what the sorted batch pass would have produced;
   *  - a session is EMITTED (Append mode) only once the event-time
   *    watermark passes `last + gapMs` — no earlier event can still arrive
   *    and extend it (events older than the watermark are dropped by the
   *    `withWatermark` operator upstream);
   *  - when a user has open sessions but no new data, emission is driven by
   *    `GroupStateTimeout.EventTimeTimeout`: the timeout is set to the
   *    earliest possible close (`min(last) + gapMs`) and re-armed while
   *    intervals remain open.
   */
  def sessionizeStream(events: Dataset[Event], gapMs: Long,
                       watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming // hoisted: the Dataset must not be captured in the closure
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSessions]) =>
          var open = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          if (!state.hasTimedOut) {
            it.foreach { e =>
              val t = e.ts.getTime
              val (touching, rest) =
                open.partition(s => t >= s.start - gapMs && t <= s.last + gapMs)
              val merged = touching.foldLeft(SessionState(t, t, 1, e.value)) { (a, s) =>
                SessionState(math.min(a.start, s.start), math.max(a.last, s.last),
                  a.n + s.n, a.v + s.v)
              }
              open = merged :: rest
            }
          }
          // batch mode has no watermark: every session closes at end-of-data
          // (same contract as [[sessionize]]); streaming closes at the
          // per-batch watermark and re-arms the event-time timeout
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val (closed, stillOpen) = open.partition(s => s.last + gapMs <= wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(OpenSessions(stillOpen))
            state.setTimeoutTimestamp(stillOpen.map(_.last).min + gapMs)
          }
          closed.sortBy(_.start).iterator.map(s =>
            Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.v))
      }
  }

  /**
   * Streaming exact dedup with BOUNDED state: drops rows whose `keys` were
   * already seen within the event-time watermark window
   * (`dropDuplicatesWithinWatermark` — state for a key is dropped once the
   * watermark passes it, so a 100 TB/day stream holds one watermark-window
   * of keys, not the full history; plain `dropDuplicates` on a stream grows
   * state forever). Batch frames take the plain distinct-by-keys path with
   * the same column contract, so the operator is testable against batch
   * semantics when duplicates arrive within the window.
   */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermarkDelay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /**
   * Stream-stream interval join — the click-attribution primitive: every
   * left row pairs with ALL right rows of the same `key` whose timestamp
   * falls within `[leftTs − lookback, leftTs]` (both bounds inclusive).
   * `leftTs`/`rightTs` must be DISTINCT column names (the condition
   * references both sides).
   *
   * On streaming inputs both sides are watermarked and the range predicate
   * is part of the join condition, which is exactly what lets Spark BOUND
   * the join state: right-side rows are evicted once the left watermark
   * passes `rightTs + lookback`, so a 100 TB/day stream holds one
   * lookback-window of state per key, never the full history. On batch
   * frames the same expression is a key-partitioned hash join with the
   * range as a post-join predicate — never a cartesian.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, lookback: String,
                   watermark: String = "2 hours"): DataFrame = {
    require(leftTs != rightTs, s"leftTs and rightTs must differ, got $leftTs")
    // explicit aliases: the two sides often share lineage (self-joins of
    // one event table), where bare df(key) references collapse to a
    // trivially-true predicate the analyzer must rescue — qualify instead
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark)
             else left).alias("__ij_l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark)
             else right).alias("__ij_r")
    l.join(r, col(s"__ij_l.$key") === col(s"__ij_r.$key") &&
        col(rightTs) <= col(leftTs) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback"))
      .drop(col(s"__ij_r.$key"))
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
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
}
