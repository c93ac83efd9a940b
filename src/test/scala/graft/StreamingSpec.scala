package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("windowed counts over the batch events table") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = EventStream.windowedCounts(events, "1 hour")
    assert(out.count() > 0)
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events.count())
  }

  test("windowed counts as a real stream with watermark (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = EventStream.windowedCounts(df, "10 minutes", "20 minutes")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts(0), 1L, "click", 1.0), (2L, ts(5), 1L, "click", 2.0),
        (3L, ts(15), 2L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      assert(rows.map(_.getLong(2)).sum == 3)
      assert(rows.length == 2) // two 10-minute windows
    } finally q.stop()
  }

  test("sliding windows: each event lands in windowDur/slideDur windows") {
    val events = Seq(
      (1L, ts(5), 1L, "click", 1.0),   // windows starting at -30 and 0
      (2L, ts(40), 1L, "click", 2.0))  // windows starting at 0 and 30
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.slidingCounts(events, "1 hour", "30 minutes").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(2), r.getDouble(3))))
      .sortBy(_._1.getTime)
    // events 35 min apart: 3 distinct epoch-aligned windows, middle shared
    assert(got.map(_._2).toSeq == Seq((1L, 1.0), (2L, 3.0), (1L, 2.0)))
    assert(got(1)._1.getTime - got(0)._1.getTime == 30 * 60000L)
    assert(got(2)._1.getTime - got(1)._1.getTime == 30 * 60000L)
    assert(got.map(_._2._1).sum == 4) // each event in exactly 2 windows
    // streaming plan accepts the same expression
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val agg = EventStream.slidingCounts(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      "1 hour", "30 minutes", "2 hours")
    val q = agg.writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts(5), 1L, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("slide_counts").count() == 2)
    } finally q.stop()
  }

  test("sessionization splits on the gap and aggregates per session") {
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "a", 2.0),
      Event(3, ts(30), 1, "a", 3.0), // > 10-minute gap -> new session
      Event(4, ts(2), 2, "b", 4.0)
    ).toDS()
    val sessions = EventStream.sessionize(events, gapMs = 10 * 60000L)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0) == Session(1, ts(0), ts(1), 2, 3.0))
    assert(sessions(1) == Session(1, ts(30), ts(30), 1, 3.0))
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 1)
  }

  test("event-time sessionization: watermark + timeout close sessions across micro-batches, out-of-order merges") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sess = EventStream.sessionizeStream(mem.toDS(), gapMs = 5 * 60000L,
      watermarkDelay = "10 minutes")
    val q = sess.writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      // micro-batch 1: user 1's events arrive OUT OF ORDER within the batch
      mem.addData(Event(2, ts(3), 1, "click", 2.0), Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      // micro-batch 2: a LATE event (ts(1), above watermark) lands in a
      // later batch and must merge into the open session; user 2's event at
      // ts(40) advances the watermark to ts(30) — past user 1's close
      mem.addData(Event(3, ts(1), 1, "view", 4.0), Event(9, ts(40), 2, "click", 0.5))
      q.processAllAvailable()
      // the watermark update takes effect next batch: this one fires user
      // 1's event-time timeout (no new data for user 1)
      mem.addData(Event(10, ts(41), 2, "click", 0.5))
      q.processAllAvailable()
      val u1 = spark.table("sessions_stream").as[Session].collect()
        .filter(_.user_id == 1)
      assert(u1.length == 1, s"expected 1 closed session, got ${u1.toSeq}")
      assert(u1(0) == Session(1, ts(0), ts(3), 3, 7.0))
    } finally q.stop()
  }

  test("file stream source reads micro-batches and sinks to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"; val in = s"$dir/in"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .limit(100).write.parquet(in)
    val stream = EventStream.readEventStream(spark, in)
    assert(stream.isStreaming)
    val q = EventStream.writeEventStream(
      stream.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props")), out, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 100)
  }

  test("streaming dedup within watermark drops cross-batch duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val dd = EventStream.dedupWithinWatermark(df, Seq("event_id"), "30 minutes")
    val q = dd.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // in-batch duplicate of id 1
      mem.addData((1L, ts(0), 1L, "click", 1.0), (2L, ts(1), 1L, "click", 2.0),
        (1L, ts(0), 1L, "click", 1.0))
      q.processAllAvailable()
      // id 1 re-arrives in a LATER micro-batch (different event time), still
      // within the 30-minute watermark window -> dropped by state
      mem.addData((1L, ts(2), 1L, "click", 9.0), (3L, ts(3), 2L, "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
    // batch frames take the plain distinct-by-keys path, same column contract
    val batch = Seq((1L, ts(0), 1L, "c", 1.0), (1L, ts(5), 1L, "c", 1.0),
      (2L, ts(1), 1L, "c", 2.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStream.dedupWithinWatermark(batch, Seq("event_id")).count() == 2)
  }

  private def attributionPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("interval join on batch frames: all matches in the lookback, bounds inclusive") {
    val clicks = Seq((100L, ts(10), 1L), (101L, ts(40), 1L), (102L, ts(10), 2L))
      .toDF("click_id", "click_ts", "user_id")
    val views = Seq((1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(35), 1L),
      (4L, ts(11), 1L), (5L, ts(9), 2L), (6L, ts(5), 3L))
      .toDF("view_id", "view_ts", "user_id")
    val got = attributionPairs(EventStream.intervalJoin(
      clicks, views, "user_id", "click_ts", "view_ts", lookback = "10 minutes"))
    // click@10/u1: views at 0 (= ts-10, inclusive) and 10 (= ts, inclusive);
    // click@40/u1: view at 35 only (11 is outside); click@10/u2: view at 9
    assert(got == Set((100L, 1L), (100L, 2L), (101L, 3L), (102L, 5L)))
  }

  test("interval join as two real streams: bounded state, out-of-order across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(Long, Timestamp, Long)]
    val memV = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStream.intervalJoin(
      memC.toDF().toDF("click_id", "click_ts", "user_id"),
      memV.toDF().toDF("view_id", "view_ts", "user_id"),
      "user_id", "click_ts", "view_ts",
      lookback = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // views arrive BEFORE and AFTER their click, split across batches
      memV.addData((1L, ts(0), 1L), (2L, ts(8), 1L))
      q.processAllAvailable()
      memC.addData((100L, ts(10), 1L))
      q.processAllAvailable()
      memV.addData((3L, ts(9), 1L)) // late view, still inside watermark
      q.processAllAvailable()
      val got = attributionPairs(spark.table("attrib"))
      assert(got == Set((100L, 1L), (100L, 2L), (100L, 3L)))
    } finally q.stop()
    // streaming result == batch result on the same data
    val batch = attributionPairs(EventStream.intervalJoin(
      Seq((100L, ts(10), 1L)).toDF("click_id", "click_ts", "user_id"),
      Seq((1L, ts(0), 1L), (2L, ts(8), 1L), (3L, ts(9), 1L))
        .toDF("view_id", "view_ts", "user_id"),
      "user_id", "click_ts", "view_ts", lookback = "10 minutes"))
    assert(batch == Set((100L, 1L), (100L, 2L), (100L, 3L)))
  }
}
