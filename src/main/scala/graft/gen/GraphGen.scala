package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic distributed graph/corpus generators — the analog of the
 * reference generator tool (`/root/reference/src/generator/totem_generator.cc`).
 * All randomness derives from a splitmix64 hash of (seed, index), so output
 * is identical regardless of parallelism, partitioning, or run count —
 * no RNG state, no driver-side loops; every generator is a `spark.range`
 * transform that scales linearly with cores.
 */
object GraphGen {

  /** splitmix64 — public-domain mixing function (Steele et al.); the
   * deterministic substitute for the reference's drand48/rand usage. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline def mix64(a: Long, b: Long): Long = mix64(mix64(a) ^ b)
  @inline def mix64(a: Long, b: Long, c: Long): Long = mix64(mix64(a, b) ^ c)
  /** uniform double in [0,1) from a hash. */
  @inline def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /**
   * R-MAT generator with the reference's parameters — a=0.57 b=0.19 c=0.19
   * d=0.05, per-level noise in [0.95,1.05], self-edges rejected by redraw
   * (`totem_generator.cc:379-468`). Sizing follows the reference:
   * V = 2^scale, E = edgeFactor * (2^scale - 2) (`totem_generator.cc:25-34`).
   * Vertex ids are NOT permuted here; compose with [[graft.core.Graph.permute]]
   * for the reference's post-generation permutation.
   */
  def rmat(spark: SparkSession, scale: Int, edgeFactor: Int, seed: Long,
           a: Double = 0.57, b: Double = 0.19, c: Double = 0.19): DataFrame = {
    import spark.implicits._
    val v = 1L << scale
    val e = edgeFactor.toLong * (v - 2L)
    val d = 1.0 - a - b - c
    spark.range(e).mapPartitions { it =>
      it.map { i =>
        // redraw loop for self-edge rejection, deterministic per edge index
        var attempt = 0L
        var src = 0L; var dst = 0L
        do {
          var s = 0L; var t = 0L
          var lvl = 0
          while (lvl < scale) {
            val h = mix64(seed, i * 131L + attempt, lvl)
            // quadrant-probability noise drawn PER EDGE PER LEVEL, exactly
            // like the reference (`totem_generator.cc:398-455` redraws noise
            // inside the per-edge level loop, not once per level)
            val noise = 0.95 + 0.10 * u01(mix64(seed ^ 0x4e01L, i * 131L + attempt, lvl))
            val aa = a * noise
            val bb = b * (2.0 - noise)
            val cc = c * (2.0 - noise)
            val dd = d * noise
            val norm = aa + bb + cc + dd
            val u = u01(h) * norm
            if (u < aa) { /* top-left */ }
            else if (u < aa + bb) { t |= (1L << lvl) }
            else if (u < aa + bb + cc) { s |= (1L << lvl) }
            else { s |= (1L << lvl); t |= (1L << lvl) }
            lvl += 1
          }
          src = s; dst = t; attempt += 1
        } while (src == dst && attempt < 8)
        (src, dst)
      }
    }.toDF("src", "dst").filter($"src" =!= $"dst")
  }

  /** Uniform random edges, no self-edges (`totem_generator.cc:470-495`). */
  def uniform(spark: SparkSession, vertexCount: Long, edgeCount: Long, seed: Long): DataFrame = {
    import spark.implicits._
    spark.range(edgeCount).mapPartitions { it =>
      it.map { i =>
        var attempt = 0L
        var s = 0L; var t = 0L
        do {
          s = java.lang.Long.remainderUnsigned(mix64(seed, i, attempt * 2), vertexCount)
          t = java.lang.Long.remainderUnsigned(mix64(seed, i, attempt * 2 + 1), vertexCount)
          attempt += 1
        } while (s == t && attempt < 8)
        (s, t)
      }
    }.toDF("src", "dst").filter($"src" =!= $"dst")
  }

  // ---- canonical small fixtures (the reference's data/ graphs, stored
  // both-directions for undirected — data/README) ----

  private def edgeDf(spark: SparkSession, es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  /** Undirected chain 0-1-2-...-(n-1), both directions stored. */
  def chain(spark: SparkSession, n: Int): DataFrame =
    edgeDf(spark, (0L until n - 1L).flatMap(i => Seq((i, i + 1), (i + 1, i))))

  /** Undirected star: hub 0 connected to 1..n-1. */
  def star(spark: SparkSession, n: Int): DataFrame =
    edgeDf(spark, (1L until n.toLong).flatMap(i => Seq((0L, i), (i, 0L))))

  /** Complete undirected graph on n vertices. */
  def complete(spark: SparkSession, n: Int): DataFrame =
    edgeDf(spark, for {
      i <- 0L until n.toLong; j <- 0L until n.toLong if i != j
    } yield (i, j))

  /** Grid graph rows x cols, 4-neighborhood, both directions. */
  def grid(spark: SparkSession, rows: Int, cols: Int): DataFrame = {
    def id(r: Int, c: Int): Long = r.toLong * cols + c
    val es = for {
      r <- 0 until rows; c <- 0 until cols
      (dr, dc) <- Seq((0, 1), (1, 0))
      if r + dr < rows && c + dc < cols
      e <- Seq((id(r, c), id(r + dr, c + dc)), (id(r + dr, c + dc), id(r, c)))
    } yield e
    edgeDf(spark, es)
  }

  /** The reference's `chain_4_comp_40_nodes`-style fixture: `comps` disjoint
   * chains of `per` vertices each (ids consecutive). */
  def disconnectedChains(spark: SparkSession, comps: Int, per: Int): DataFrame =
    edgeDf(spark, (0 until comps).flatMap { ci =>
      val base = ci.toLong * per
      (0L until per - 1L).flatMap(i => Seq((base + i, base + i + 1), (base + i + 1, base + i)))
    })

  // ---- Common-Crawl-style page corpus (north-rule input shape) ----

  private val Langs = Array("en", "de", "fr", "es", "zh")
  private val Words = Array(
    "spark", "graph", "rank", "vertex", "edge", "crawl", "web", "page", "link",
    "data", "query", "join", "shuffle", "partition", "scale", "engine", "node",
    "index", "table", "batch", "stream", "hash", "sort", "merge", "scan")

  /**
   * Deterministic synthetic page corpus with the `BASELINE.json.input_hint`
   * schema: (url string, warc_ts timestamp, html binary, text string,
   * lang string). Outlinks follow an RMAT-style skewed target distribution so
   * the extracted link graph is power-law like a real web graph.
   *
   * Invariant (north rule "byte-identical per-url text"): the stored `text`
   * column is produced by [[graft.text.TextExtract.extract]] applied to the
   * stored `html` — asserted in tests, held by construction here.
   */
  def pages(spark: SparkSession, nPages: Long, seed: Long, linksPerPage: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = spark.range(nPages).mapPartitions { it =>
      it.map { i =>
        val lang = Langs((java.lang.Long.remainderUnsigned(mix64(seed, i, 1L), Langs.length)).toInt)
        val nw = 20 + (java.lang.Long.remainderUnsigned(mix64(seed, i, 2L), 60L)).toInt
        val body = (0 until nw).map { k =>
          Words((java.lang.Long.remainderUnsigned(mix64(seed, i * 97L + k, 3L), Words.length)).toInt)
        }.mkString(" ")
        val nl = (java.lang.Long.remainderUnsigned(mix64(seed, i, 4L), 2L * linksPerPage + 1L)).toInt
        val links = (0 until nl).map { k =>
          // skewed target choice: square a uniform to bias toward low ids
          val u = u01(mix64(seed, i * 131L + k, 5L))
          val tgt = math.min(nPages - 1, (u * u * nPages).toLong)
          s"""<a href="https://example.org/p/$tgt">ref $tgt</a>"""
        }.mkString(" ")
        val html =
          s"""<html><head><title>Page $i</title><style>body{color:red}</style></head>
             |<body><h1>Page $i</h1><p>$body</p>
             |<script>var x = $i;</script>
             |<div>$links &amp; more</div></body></html>""".stripMargin
        val text = graft.text.TextExtract.extract(html)
        val ts = java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 7L))
        (s"https://example.org/p/$i", ts, html.getBytes("UTF-8"), text, lang)
      }
    }.toDF("url", "warc_ts", "html", "text", "lang")
    rows
  }
}
