package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal as-of join: each left row picks the single most recent right row
 * with the same key and right.ts <= left.ts (backward-looking, inclusive).
 * The canonical event-enrichment operator for a crawl/event pipeline —
 * "attach the page snapshot / user state that was current when this event
 * happened". An extension beyond the reference inventory (Totem has no
 * temporal operators); the task-level analog is Flink's temporal table join
 * and DuckDB's ASOF JOIN, which is exactly the correctness oracle.
 *
 * Two physical strategies, one semantics:
 *
 *  - [[asof]] — union-marker + running `last(_, ignoreNulls)` over a
 *    (key)-partitioned window ordered by (ts, side). ONE shuffle on key and
 *    an in-partition sort; NO join node at all, so there is no build side
 *    to size and no row ever compares against more than its own partition.
 *    The idiomatic plan when keys are plentiful (user_id, url): at 1000
 *    executors each task sorts only its own key range. A single
 *    mega-hot key serializes into one task, which is where the second
 *    strategy comes in.
 *
 *  - [[asofBucketed]] — for a BOUNDED lookback (`toleranceMs`), buckets
 *    time into `bucketMs` slices and replicates each right row into the
 *    ceil(tolerance/bucket)+1 buckets whose left rows could match it; the
 *    join key becomes (key, bucket), so a hot key's work splits across
 *    time buckets and AQE/skew handling applies to the join like any
 *    other. Cost: right replication factor tolerance/bucket + 1 — pick
 *    bucketMs ≈ toleranceMs for 2×. This is the scale path for power-law
 *    keys (the google.com of keys), and the tolerance is the production
 *    norm anyway (state older than N days is stale).
 *
 * Determinism contract: `right` must be unique per (key, ts) — canonicalize
 * with [[graft.text.UrlOps.latestSnapshot]]-style max_by first. With that,
 * both strategies return byte-identical results (spec-checked against each
 * other and against DuckDB's ASOF JOIN). Left rows with no match keep null
 * payloads (left-join semantics).
 */
object AsOfJoin {

  /**
   * Window-strategy as-of join (unbounded lookback).
   *
   * @param left    left rows; all its columns survive
   * @param right   right rows, unique per (key, ts)
   * @param key     equi-join key column name (present on both sides)
   * @param ts      event-time column name (present on both sides; any
   *                orderable type — timestamp, long, ...)
   * @param payload right-side value columns to attach; emitted under the
   *                same names (must not collide with left column names)
   */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload ${payload.mkString(",")} collides with a left column")
    // align schemas: left rows carry null payloads, right rows carry null
    // left-only columns; side orders right (0) before left (1) at equal ts
    // so the match is inclusive (right.ts == left.ts matches)
    val leftOnly = leftCols.filterNot(c => c == key || c == ts)
    // the payload rides as ONE struct so the running last() picks the whole
    // most-recent right ROW atomically — per-column last(ignoreNulls) would
    // tear a multi-column payload across right rows whenever the newest row
    // carries a null field (an older non-null value would leak through)
    val payT = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftOnly.map(col) :+
        lit(null).cast(payT).as("__pay")): _*)
    val r = right.select(
      (Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__pay")): _*)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((Seq(col(key), col(ts), col("__side")) ++ leftOnly.map(col) :+
        last(col("__pay"), ignoreNulls = true).over(w).as("__pay")): _*)
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__pay.$p").as(p)): _*)
  }

  /**
   * Bucketed-join strategy with a bounded lookback: the most recent right
   * row with left.ts - toleranceMs <= right.ts <= left.ts, else null
   * payloads. `ts` must be epoch milliseconds (convert timestamps with
   * `unix_millis` first); `leftId` names a unique left row id.
   *
   * Plan: right rows replicate into every `bucketMs` slice they can serve,
   * one (key, bucket)-keyed hash join, then a max_by per left row over at
   * most the rows of one bucket — hot keys split across time, no window.
   */
  def asofBucketed(left: DataFrame, right: DataFrame, key: String, ts: String,
                   leftId: String, payload: Seq[String],
                   toleranceMs: Long, bucketMs: Long): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(toleranceMs >= 0 && bucketMs > 0,
      s"need toleranceMs >= 0 and bucketMs > 0, got $toleranceMs/$bucketMs")
    val leftCols = left.columns.toSeq
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload ${payload.mkString(",")} collides with a left column")
    val span = (toleranceMs / bucketMs + 1L).toInt
    // a right row at rts serves left rows in [rts, rts+tolerance] — i.e.
    // buckets floor(rts/bucket) .. floor((rts+tolerance)/bucket)
    val rRep = right
      .withColumn("__b", explode(sequence(
        floor(col(ts) / bucketMs),
        floor((col(ts) + lit(toleranceMs)) / lit(bucketMs)))))
      .select((Seq(col(key).as("__rk"), col("__b"), col(ts).as("__rts")) ++
        payload.map(col)): _*)
    val lKeyed = left.withColumn("__b", floor(col(ts) / bucketMs))
    val matched = lKeyed
      .join(rRep, lKeyed(key) === rRep("__rk") && lKeyed("__b") === rRep("__b"))
      .filter(col(ts) >= col("__rts") &&
        col(ts) - col("__rts") <= lit(toleranceMs))
      // most recent match per left row; (key, ts) uniqueness on the right
      // makes max_by deterministic
      .groupBy(col(leftId).as("__lid"))
      .agg(max(struct((Seq(col("__rts")) ++ payload.map(col)): _*)).as("__m"))
      .select((Seq(col("__lid")) ++
        payload.map(p => col(s"__m.$p").as(p))): _*)
    left.join(matched, left(leftId) === matched("__lid"), "left")
      .select((leftCols ++ payload).map(col): _*)
    // span is intentionally not materialized per-row: replication factor is
    // `span`, a plan-time constant the caller sizes (bucketMs ≈ toleranceMs
    // gives span = 2)
  }
}
