package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
 * session startup dominates test wall time otherwise). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the sandbox hypervisor occasionally stalls the whole VM for minutes;
      // don't let the heartbeat receiver kill the local executor mid-suite
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** collect a (vid, value) DataFrame to a sorted map keyed by vid. */
  def toMap[T](df: DataFrame): Map[Long, T] =
    df.collect().map(r => r.getLong(0) -> r.get(1).asInstanceOf[T]).toMap

  def assertAllClose(actual: Map[Long, Double], expected: Seq[Double], tol: Double = 1e-6): Unit = {
    assert(actual.size == expected.size,
      s"size mismatch: ${actual.size} vs ${expected.size}")
    expected.zipWithIndex.foreach { case (e, i) =>
      val a = actual(i.toLong)
      assert(math.abs(a - e) <= tol * math.max(1.0, math.abs(e)),
        s"vid=$i: $a vs $e (tol $tol)")
    }
  }
}
