package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann

class AnnSpec extends SparkSpec {

  test("semanticContaminated: threshold semantics on hand vectors") {
    import spark.implicits._
    val bench = Seq(Tuple1(Array(1f, 0f))).toDF("b_embedding")
    val corpus = Seq(
      (10L, Array(1f, 0f)),     // sim 1.0        -> contaminated
      (11L, Array(0f, 1f)),     // sim 0.0        -> clean
      (12L, Array(0.9f, 0.1f))  // sim ~0.994     -> contaminated
    ).toDF("vec_id", "embedding")
    val got = Ann.semanticContaminated(corpus, bench, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(10L -> true, 11L -> false, 12L -> true))
  }
  test("semDedup: within-cluster min-id keeper; clusters bound the pair scan") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),      // cluster 0
      (1L, Array(0.95f, 0.05f, 0f)),// cluster 0, near-dup of 0 -> dropped
      (2L, Array(0.9f, 0.1f, 0f)),  // cluster 0, near-dup of 0 and 1 -> dropped
      (3L, Array(0f, 1f, 0f)),      // cluster 1
      (4L, Array(0f, 0f, 1f))       // cluster 1: orthogonal to 3, kept —
                                    // and a near-dup of nothing in cluster 0
    ).toDF("vec_id", "embedding")
    val assignments = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("vec_id", "cid")
    val got = Ann.semDedup(emb, assignments, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> false, 3L -> true, 4L -> true))
    // cluster blindness is the documented contract: a cross-cluster twin is
    // NOT dropped (that's what makes the scan O(sum cluster^2), not O(n^2))
    val twin = Seq((5L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val got2 = Ann.semDedup(emb.union(twin),
        assignments.union(Seq((5L, 1)).toDF("vec_id", "cid")), threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got2(5L), "cross-cluster near-dup must survive by construction")
  }

  import spark.implicits._

  private lazy val corpus = {
    // deterministic unit-ish vectors in 8d
    val rows = (0 until 50).map { i =>
      val v = Array.tabulate(8)(d =>
        (graft.gen.GraphGen.mix64(7L, i.toLong, d.toLong) % 1000L).toFloat / 1000f)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("cosine column: self-similarity 1, orthogonal 0") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 1f), Array(1f, 1f), 1.0)
    ).toDF("a", "b", "want")
    df.select(Ann.cosine(col("a"), col("b")).as("got"), col("want")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("brute-force top-k: rank 1 is the vector itself when queried") {
    val queries = corpus.limit(3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val top = Ann.bruteForceTopK(corpus, queries, k = 5)
    val r1 = top.filter(col("rank") === 1).collect()
    r1.foreach(r => assert(r.getLong(0) == r.getLong(1), "self not top-1"))
    assert(top.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("LSH top-k recall vs brute force (multi-probe)") {
    val queries = corpus.limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Ann.bruteForceTopK(corpus, queries, k = 3).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(corpus, queries, k = 3, planes = 4, multiProbe = true)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low") // 4 planes + probe on 50 vecs
  }

  test("LSH multi-table: superset of single-table candidates, higher recall") {
    val queries = corpus.limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Ann.bruteForceTopK(corpus, queries, k = 3).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def ids(t: Int) =
      Ann.lshTopK(corpus, queries, k = 50, planes = 4, probeRadius = 1, tables = t)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = ids(1); val three = ids(3)
    // table 0 of the 3-table run draws the SAME hash-seeded plane family
    // as the single-table run, so its candidates survive verbatim
    assert(one.subsetOf(three), "tables must only add candidates")
    val r1 = exact.count(one.contains).toDouble / exact.size
    val r3 = exact.count(three.contains).toDouble / exact.size
    assert(r3 >= r1, s"3-table recall $r3 below 1-table $r1")
    assert(r3 >= 0.9, s"3-table recall $r3 below the q_ann_lsh_recall floor")
  }

  test("near-dup pairs: LSH finds what brute force finds at high threshold") {
    // plant a near-duplicate pair
    val planted = corpus.union(Seq(
      (1000L, corpus.filter(col("vec_id") === 0).collect()(0)
        .getSeq[Float](1).toArray.map(x => x * 1.001f))).toDF("vec_id", "embedding"))
    val bf = Ann.bruteForceNearDupPairs(planted, 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.contains((0L, 1000L)))
    val lsh = Ann.cosineNearDupPairs(planted, 0.9999, planes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.contains((0L, 1000L)))
  }

  test("IVF top-k: full probe is exact; partial probe keeps recall") {
    val queries = corpus.limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Ann.bruteForceTopK(corpus, queries, k = 3).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe == nlist probes every list -> identical to brute force
    val full = graft.ann.Ivf.ivfTopK(corpus, queries, k = 3, nlist = 4, nprobe = 4)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "full-probe IVF must equal brute force")
    val partial = graft.ann.Ivf.ivfTopK(corpus, queries, k = 3, nlist = 4, nprobe = 2)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(partial.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("IVF assignment is deterministic and covers every vector once") {
    val cents = graft.ann.Ivf.trainCentroids(corpus, nlist = 4, sampleN = 64)
    val a1 = graft.ann.Ivf.assign(corpus, cents).select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val a2 = graft.ann.Ivf.assign(corpus, cents).select("vec_id", "cid")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a1 == a2, "assignment not deterministic")
    assert(a1.size == 50, "each vector assigned exactly once")
    assert(a1.values.toSet.subsetOf((0 until 4).toSet))
  }

  test("works on the driver embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.limit(2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val top = Ann.bruteForceTopK(emb, queries, k = 10)
    assert(top.count() == 20)
  }

  test("marginTopK matches an exact driver-side nano-unit replay") {
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      val v = Array.tabulate(6) { d =>
        (graft.gen.GraphGen.mix64(9L, i.toLong, d.toLong) % 1000L).toFloat / 1000f
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding").cache()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val k = 5; val m = 3
    val got = Ann.marginTopK(emb, queries, k, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
      .toSet

    // driver replay: same ordered-sum cosine, same nano quantization
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
    }
    def nano(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val all = vecs.toMap
    def topk(x: Long): Seq[(Long, Long)] =
      all.keys.filter(_ != x).toSeq
        .map(y => (y, nano(cos(all(x), all(y)))))
        .sortBy { case (y, s) => (-s, y) }.take(k)
    val want = (0L until 3L).flatMap { q =>
      val tq = topk(q); val qsum = tq.map(_._2).sum
      val margins = tq.map { case (c, sn) =>
        val csum = topk(c).map(_._2).sum
        val margin = if (qsum + csum > 0)
          BigDecimal(sn.toDouble * 2 * k / (qsum + csum).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
        (c, BigDecimal(sn.toDouble / 1e9).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, margin)
      }
      margins.sortBy { case (c, _, mg) => (-mg, c) }.take(m).zipWithIndex
        .map { case ((c, s, mg), i) => (q, c, s, mg, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("probeMasks covers every Hamming weight up to the requested radius") {
    def choose(n: Int, k: Int): Long =
      (1 to k).map(i => (n - i + 1).toDouble / i).product.round
    for (radius <- 0 to 3) {
      val masks = Ann.probeMasks(8, radius)
      assert(masks.distinct.size == masks.size)
      assert(masks.forall(m => java.lang.Long.bitCount(m) <= radius))
      val expect = (0 to radius).map(r => choose(8, r)).sum
      assert(masks.size.toLong == expect, s"radius=$radius got ${masks.size}")
    }
  }
}
