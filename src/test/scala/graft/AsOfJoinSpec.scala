package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, v) — ts as plain longs
  private val left = Seq(
    (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L),
    (4L, 20L, 300L), (5L, 20L, 99L),
    (6L, 30L, 500L)).toDF("id", "k", "t")
  private val right = Seq(
    (10L, 100L, 1.0), (10L, 200L, 2.0), (10L, 300L, 3.0),
    (20L, 100L, 4.0), (20L, 250L, 5.0)).toDF("k", "t", "v")

  private def handOracle(tol: Long = Long.MaxValue): Map[Long, Option[Double]] = {
    val r = Seq((10L, 100L, 1.0), (10L, 200L, 2.0), (10L, 300L, 3.0),
      (20L, 100L, 4.0), (20L, 250L, 5.0))
    Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L),
      (4L, 20L, 300L), (5L, 20L, 99L), (6L, 30L, 500L)).map { case (id, k, t) =>
      id -> r.filter(x => x._1 == k && x._2 <= t && t - x._2 <= tol)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
  }

  test("window strategy matches the hand oracle (inclusive, left-join nulls)") {
    val got = AsOfJoin.asof(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == handOracle())
    // row 1: right at t=100 equals left t=100 -> inclusive match
    assert(got(1L).contains(1.0))
    // row 3 precedes all right rows; key 30 has no right rows
    assert(got(3L).isEmpty && got(6L).isEmpty)
  }

  test("bucketed strategy equals windowed-then-tolerance-nulled at every bucket size") {
    val tol = 120L
    val expected = handOracle(tol)
    for (bucket <- Seq(1L, 7L, 120L, 1000L)) {
      val got = AsOfJoin.asofBucketed(left, right, "k", "t", "id", Seq("v"),
          toleranceMs = tol, bucketMs = bucket)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got == expected, s"bucketMs=$bucket")
    }
  }

  test("strategies agree on a random dataset and are partitioning-invariant") {
    val n = 500
    val l = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(7L)).as("k"),
      pmod(xxhash64(col("id") + 1000000), lit(10000L)).as("t"))
    val r = spark.range(200).select(
      pmod(xxhash64(col("id") + 5), lit(7L)).as("k"),
      pmod(xxhash64(col("id") + 2000000), lit(10000L)).as("t"),
      (col("id") % 97).cast("double").as("v"))
      // determinism contract: unique per (k, t)
      .groupBy("k", "t").agg(max("v").as("v"))
    val tol = 2000L
    // tolerance on the window strategy: attach the matched right ts in a
    // struct payload, then null out stale matches
    val winTol = AsOfJoin.asof(l, r.select(col("k"), col("t"),
        struct(col("t").as("rt"), col("v").as("rv")).as("m")),
      "k", "t", Seq("m"))
      .select(col("id"),
        when(col("t") - col("m.rt") <= tol, col("m.rv")).as("v"))
    val buck = AsOfJoin.asofBucketed(l, r, "k", "t", "id", Seq("v"), tol, 512L)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    val a = asMap(winTol)
    val b = asMap(buck)
    assert(a == b)
    val c = asMap(AsOfJoin.asofBucketed(l.repartition(13), r.repartition(3),
      "k", "t", "id", Seq("v"), tol, 512L))
    assert(c == b)
    assert(AsOfJoin.asof(l, r, "k", "t", Seq("v")).count() == n)
  }

  test("multi-column payload is atomic: a null field in the newest right row wins") {
    val l = Seq((1L, 10L, 3L)).toDF("id", "k", "t")
    val r = Seq((10L, 1L, Some(5.0), Some(7.0)), (10L, 2L, Some(9.0), None))
      .toDF("k", "t", "a", "b")
    // the newest matching right row (t=2) carries b=null; per-column
    // last(ignoreNulls) would smuggle b=7.0 in from the OLDER row — both
    // strategies must return the t=2 row verbatim: (a=9.0, b=null)
    val win = AsOfJoin.asof(l, r, "k", "t", Seq("a", "b")).collect()(0)
    assert(win.getDouble(3) == 9.0 && win.isNullAt(4))
    val buck = AsOfJoin.asofBucketed(l, r, "k", "t", "id", Seq("a", "b"),
      toleranceMs = 100L, bucketMs = 64L).collect()(0)
    assert(buck.getDouble(3) == 9.0 && buck.isNullAt(4))
  }
}
