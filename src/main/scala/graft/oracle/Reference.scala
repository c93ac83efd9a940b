package graft.oracle

import scala.collection.mutable

/**
 * Single-JVM exact oracle — plain-Scala ports of the reference's CPU
 * algorithm SEMANTICS (not code), used only by tests, mirroring how the
 * reference's unit tests compare hybrid runs against `_cpu` baselines
 * (`/root/reference/src/test/totem_page_rank_unittest.cu:131-138`).
 *
 * Graphs are dense-id CSR-ish: `edges` is the full multigraph edge list
 * (both directions already present for undirected graphs), vertex ids in
 * [0, v).
 */
object Reference {

  private def adjacency(v: Int, edges: Seq[(Long, Long)]): Array[Array[Int]] = {
    val b = Array.fill(v)(mutable.ArrayBuffer[Int]())
    edges.foreach { case (s, d) => b(s.toInt) += d.toInt }
    b.map(_.toArray)
  }

  /** `page_rank_cpu` semantics (`totem_page_rank.cu:351-409`), double
   * precision. Returns rank per vertex id. */
  def pageRank(v: Int, edges: Seq[(Long, Long)], rounds: Int = 5,
               damping: Double = 0.85): Array[Double] = {
    val adj = adjacency(v, edges)
    val rank = Array.fill(v)(1.0 / v)
    val mailbox = new Array[Double](v)
    for (round <- 0 until rounds) {
      java.util.Arrays.fill(mailbox, 0.0)
      for (u <- 0 until v; n <- adj(u)) mailbox(n) += rank(u)
      for (u <- 0 until v) {
        val value = (1.0 - damping) / v + damping * mailbox(u)
        rank(u) = if (round == rounds - 1 || adj(u).isEmpty) value else value / adj(u).length
      }
    }
    rank
  }

  /** HashMin WCC: component label = min vertex id of the component
   * (`totem_cc_hybrid.cu:392-463` converged result). Treats edges as
   * undirected. */
  def wcc(v: Int, edges: Seq[(Long, Long)]): Array[Long] = {
    val parent = Array.tabulate(v)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb } }
    edges.foreach { case (s, d) => union(s.toInt, d.toInt) }
    // path-compress to min id: union by smaller root keeps root = min id
    Array.tabulate(v)(i => find(i).toLong)
  }

  /** LabelRank with the reference's exact dense-matrix semantics
   * (`totem_label_propagation.cu:82-217`), double precision. */
  def labelRank(v: Int, edges: Seq[(Long, Long)],
                maxIterations: Int = 25, stable: Int = 5): Array[Long] = {
    val adj = adjacency(v, edges)
    var p = Array.fill(v, v)(0.0)
    var pNew = Array.fill(v, v)(0.0)
    val labels = Array.tabulate(v)(_.toLong)
    val counter = new Array[Int](v)
    // init: P[u][u]=1 then P[u][nbr]=1/deg (self-loop overwrites the 1)
    for (u <- 0 until v) {
      p(u)(u) = 1.0
      val deg = adj(u).length
      adj(u).foreach(n => p(u)(n) = 1.0 / deg)
    }
    var finished = false
    var iter = 0
    while (!finished) {
      for (u <- 0 until v; l <- 0 until v) {
        var s = 0.0
        adj(u).foreach(n => s += p(n)(l))
        pNew(u)(l) = s / adj(u).length // NaN for isolated vertices, as in ref
      }
      for (u <- 0 until v) {
        var maxP = 0.0; var maxL = 0
        for (l <- 0 until v) {
          p(u)(l) = pNew(u)(l)
          // match the engine's 12-decimal tie-collapse (see
          // LabelPropagation.labelRank): ulp-order noise must not pick the
          // argmax on symmetric graphs
          val pr = if (p(u)(l).isNaN) p(u)(l)
          else BigDecimal(p(u)(l)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (pr > maxP) { maxP = pr; maxL = l }
        }
        if (labels(u) == maxL) counter(u) += 1 else counter(u) = 0
        labels(u) = maxL
      }
      finished = (0 until v).forall(counter(_) >= stable)
      iter += 1
      if (iter >= maxIterations) finished = true
    }
    labels
  }

  /** Per-vertex triangle counts on the simple undirected graph. */
  def triangles(v: Int, edges: Seq[(Long, Long)]): Array[Long] = {
    val nbrs = Array.fill(v)(mutable.SortedSet[Int]())
    edges.foreach { case (s, d) =>
      if (s != d) { nbrs(s.toInt) += d.toInt; nbrs(d.toInt) += s.toInt }
    }
    val t = new Array[Long](v)
    for (a <- 0 until v; b <- nbrs(a) if b > a; c <- nbrs(a) if c > b)
      if (nbrs(b).contains(c)) { t(a) += 1; t(b) += 1; t(c) += 1 }
    t
  }

  /** Local clustering coefficient: 2T/(d(d-1)), 0 if d<2
   * (`totem_clustering.cu:368-431`). */
  def clusteringCoefficient(v: Int, edges: Seq[(Long, Long)]): Array[Double] = {
    val t = triangles(v, edges)
    val deg = new Array[Int](v)
    val seen = mutable.Set[(Int, Int)]()
    edges.foreach { case (s, d) =>
      val (a, b) = (math.min(s, d).toInt, math.max(s, d).toInt)
      if (a != b && !seen.contains((a, b))) { seen += ((a, b)); deg(a) += 1; deg(b) += 1 }
    }
    Array.tabulate(v)(i =>
      if (deg(i) < 2) 0.0 else 2.0 * t(i) / (deg(i).toLong * (deg(i) - 1)))
  }

  /** BFS levels; -1 = unreached. */
  def bfs(v: Int, edges: Seq[(Long, Long)], source: Int): Array[Int] = {
    val adj = adjacency(v, edges)
    val cost = Array.fill(v)(-1)
    cost(source) = 0
    val q = mutable.Queue(source)
    while (q.nonEmpty) {
      val u = q.dequeue()
      adj(u).foreach { n => if (cost(n) < 0) { cost(n) = cost(u) + 1; q += n } }
    }
    cost
  }

  /** Brandes betweenness (unweighted, directed along stored edges) over the
   * given sources — `totem_betweenness.cu` semantics. */
  def betweenness(v: Int, edges: Seq[(Long, Long)], sources: Seq[Int]): Array[Double] = {
    val adj = adjacency(v, edges)
    val bc = new Array[Double](v)
    sources.foreach { s =>
      val stack = mutable.Stack[Int]()
      val preds = Array.fill(v)(mutable.ArrayBuffer[Int]())
      val sigma = new Array[Double](v); sigma(s) = 1.0
      val dist = Array.fill(v)(-1); dist(s) = 0
      val q = mutable.Queue(s)
      while (q.nonEmpty) {
        val u = q.dequeue(); stack.push(u)
        adj(u).foreach { w =>
          if (dist(w) < 0) { dist(w) = dist(u) + 1; q += w }
          if (dist(w) == dist(u) + 1) { sigma(w) += sigma(u); preds(w) += u }
        }
      }
      val delta = new Array[Double](v)
      while (stack.nonEmpty) {
        val w = stack.pop()
        preds(w).foreach { u => delta(u) += sigma(u) / sigma(w) * (1.0 + delta(w)) }
        if (w != s) bc(w) += delta(w)
      }
    }
    bc
  }

  /** Stress centrality (shortest-path counts through each vertex). */
  def stress(v: Int, edges: Seq[(Long, Long)], sources: Seq[Int]): Array[Long] = {
    val adj = adjacency(v, edges)
    val st = new Array[Double](v)
    sources.foreach { s =>
      val stack = mutable.Stack[Int]()
      val preds = Array.fill(v)(mutable.ArrayBuffer[Int]())
      val sigma = new Array[Double](v); sigma(s) = 1.0
      val dist = Array.fill(v)(-1); dist(s) = 0
      val q = mutable.Queue(s)
      while (q.nonEmpty) {
        val u = q.dequeue(); stack.push(u)
        adj(u).foreach { w =>
          if (dist(w) < 0) { dist(w) = dist(u) + 1; q += w }
          if (dist(w) == dist(u) + 1) { sigma(w) += sigma(u); preds(w) += u }
        }
      }
      val delta = new Array[Double](v)
      while (stack.nonEmpty) {
        val w = stack.pop()
        preds(w).foreach { u => delta(u) += sigma(u) * (1.0 + delta(w) / sigma(w)) }
        if (w != s) st(w) += delta(w)
      }
    }
    st.map(math.round)
  }

  /** Dijkstra SSSP; Double.PositiveInfinity = unreached. */
  def sssp(v: Int, wedges: Seq[(Long, Long, Double)], source: Int): Array[Double] = {
    val adj = Array.fill(v)(mutable.ArrayBuffer[(Int, Double)]())
    wedges.foreach { case (s, d, w) => adj(s.toInt) += ((d.toInt, w)) }
    val dist = Array.fill(v)(Double.PositiveInfinity)
    dist(source) = 0.0
    val pq = mutable.PriorityQueue[(Double, Int)]()(Ordering.by(-_._1))
    pq.enqueue((0.0, source))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d <= dist(u))
        adj(u).foreach { case (n, w) =>
          if (d + w < dist(n)) { dist(n) = d + w; pq.enqueue((d + w, n)) }
        }
    }
    dist
  }
}
