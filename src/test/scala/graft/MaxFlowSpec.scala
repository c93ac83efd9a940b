package graft

import org.apache.spark.sql.functions._
import graft.alg.MaxFlow

class MaxFlowSpec extends SparkSpec {
  import spark.implicits._

  test("single path: flow = min capacity on the path") {
    val e = Seq((0L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 7.0)).toDF("src", "dst", "weight")
    assert(MaxFlow.maxFlow(e, 0L, 3L).value == 3.0)
  }

  test("parallel disjoint paths add") {
    val e = Seq((0L, 1L, 4.0), (1L, 3L, 4.0), (0L, 2L, 2.0), (2L, 3L, 5.0))
      .toDF("src", "dst", "weight")
    assert(MaxFlow.maxFlow(e, 0L, 3L).value == 6.0)
  }

  test("classic CLRS network: max flow 23") {
    // CLRS fig 26.1: s=0 v1=1 v2=2 v3=3 v4=4 t=5
    val e = Seq(
      (0L, 1L, 16.0), (0L, 2L, 13.0), (1L, 3L, 12.0), (2L, 1L, 4.0),
      (2L, 4L, 14.0), (3L, 2L, 9.0), (3L, 5L, 20.0), (4L, 3L, 7.0), (4L, 5L, 4.0)
    ).toDF("src", "dst", "weight")
    val res = MaxFlow.maxFlow(e, 0L, 5L)
    assert(res.value == 23.0)
    // flow conservation at interior vertices
    val flows = res.flows.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (v <- 1L to 4L) {
      val in = flows.filter(_._2 == v).map(_._3).sum
      val out = flows.filter(_._1 == v).map(_._3).sum
      assert(math.abs(in - out) < 1e-9, s"conservation at $v: in=$in out=$out")
    }
    // source outflow equals the value
    assert(math.abs(flows.filter(_._1 == 0L).map(_._3).sum - 23.0) < 1e-9)
  }

  test("disconnected sink: flow 0") {
    val e = Seq((0L, 1L, 5.0), (2L, 3L, 5.0)).toDF("src", "dst", "weight")
    assert(MaxFlow.maxFlow(e, 0L, 3L).value == 0.0)
  }
}
