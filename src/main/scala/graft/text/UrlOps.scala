package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization and crawl-snapshot selection — the first two
 * operators of any Common-Crawl-style ingest: the same page is fetched many
 * times under cosmetically different urls (case-varying host, fragments,
 * explicit default ports) and at many `warc_ts` capture times; training
 * pipelines keep ONE canonical row per page, usually the latest capture.
 *
 * Scale design:
 *  - [[normalizeUrl]] is a pure codegen'd regex `Column` chain (no UDF, no
 *    shuffle) — it fuses into the scan;
 *  - [[latestSnapshot]] is a single `max_by` aggregation keyed on the
 *    normalized url: map-side combinable (each task keeps one candidate row
 *    per url before the exchange), so the shuffle carries at most one row
 *    per (task, url) — the right shape when a url recurs across the whole
 *    crawl. No windows, no sort of a url's full history anywhere.
 *
 * Ties on `warc_ts` break deterministically by the id column so the winner
 * is engine-independent (same cross-engine contract as
 * [[Curation.capPerKey]]).
 */
object UrlOps {

  /**
   * Canonical form of an absolute http(s) url:
   *  1. fragment stripped;
   *  2. scheme + authority lowercased (path/query case is significant and
   *     kept);
   *  3. explicit default ports removed (`:80` for http, `:443` for https);
   *  4. a bare root path `/` with nothing after it dropped.
   */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase ONLY scheme://authority; keep the rest byte-identical
    val head = lower(regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^/?#]*//[^/?#]*", "")
    val joined = concat(head, rest)
    val noPort = regexp_replace(
      regexp_replace(joined, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    regexp_replace(noPort, "^(https?://[^/?#]+)/$", "$1")
  }

  /**
   * Domain-suffix blocklist filter — the crawl-pipeline primitive: a host
   * `a.b.example.org` is blocked by blocklist entries `example.org`,
   * `b.example.org`, … (label-boundary suffixes, case-insensitive).
   *
   * Spark-first shape: each host explodes into its O(#labels) dot-suffix
   * chain and hash-joins the blocklist on the suffix — never a per-row scan
   * of the blocklist, never a regex alternation. The blocklist side
   * broadcasts when small and degrades to an ordinary equi-join when huge
   * (a billion-entry blocklist still joins by key). Because one host's
   * suffixes form a NESTED chain, all its blocklist matches are suffixes of
   * each other — the longest match is unique, reported as `block_suffix`.
   *
   * Output: (id, host, blocked, block_suffix) with `host` lowercased and
   * `block_suffix` null for unblocked rows.
   */
  def suffixBlock(df: DataFrame, id: Column, host: Column,
                  blocklist: DataFrame, suffixCol: String = "suffix"): DataFrame = {
    val base = df.select(id.as("id"), lower(host).as("host"))
    val labs = base.select(col("id"), split(col("host"), "\\.").as("L"))
    val sufs = labs.select(col("id"),
      explode(transform(sequence(lit(1), size(col("L"))),
        i => array_join(slice(col("L"), i, size(col("L")) - i + 1), ".")))
        .as("sfx"))
    val hits = sufs
      .join(blocklist.select(lower(col(suffixCol)).as("sfx")).distinct(), Seq("sfx"))
      .groupBy("id")
      .agg(max(struct(length(col("sfx")).as("l"), col("sfx").as("s"))).as("m"))
    base.join(hits, Seq("id"), "left")
      .select(col("id"), col("host"),
        col("m").isNotNull.as("blocked"), col("m.s").as("block_suffix"))
  }

  /**
   * Redirect-chain resolution — the crawl-canonicalization step between
   * [[normalizeUrl]] and dedup/link analysis: a url that 301s through
   * `a → b → c` must be credited to `c` everywhere (link graph, snapshot
   * selection, dedup keeper) or the same page fragments into chain-length
   * many identities.
   *
   * Spark-first shape: POINTER DOUBLING over the redirect forest (the WCC
   * pointer-jumping device). The jump table starts as the 1-hop edges and
   * composes with itself each round (span doubles), while the per-url
   * state applies the current jump table — after `doublings` rounds every
   * acyclic chain of length ≤ 2^doublings − 1 is fully resolved in
   * O(doublings) key-partitioned hash joins, never O(chain) sequential
   * joins and never a driver-side walk. State stays O(urls) rows
   * throughout; each round cuts lineage (the superstep barrier).
   *
   * Redirect input is made functional deterministically (min dst per
   * src). Cycles — crawler traps like `a → b → a`, including urls whose
   * chain merely ENTERS a cycle downstream — never reach a terminal:
   * any url whose final position still has an outgoing redirect reports
   * `(url, url, -1, false)` (canonical form, engine-independent).
   * Resolved rows report the true terminal and exact hop count.
   *
   * Output: (url, final_url, hops, resolved) for every row of `urls`;
   * urls with no redirect resolve to themselves with hops 0.
   */
  def resolveRedirects(redirects: DataFrame, urls: DataFrame,
                       doublings: Int = 5,
                       srcCol: String = "src_url", dstCol: String = "dst_url",
                       urlCol: String = "url"): DataFrame = {
    require(doublings >= 1, s"doublings must be >= 1, got $doublings")
    val nxt0 = redirects.groupBy(col(srcCol).as("u"))
      .agg(min(col(dstCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var jump = nxt0.withColumn("span", lit(1L))
    var state = urls.select(col(urlCol).as("url"))
      .withColumn("cur", col("url")).withColumn("hops", lit(0L))
    for (_ <- 1 to doublings) {
      state = state
        .join(jump.select(col("u").as("cur"), col("v"), col("span")), Seq("cur"), "left")
        .select(col("url"), coalesce(col("v"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("span"), lit(0L))).as("hops"))
        .transform(graft.core.Lineage.cut)
      jump = jump.as("a")
        .join(jump.select(col("u").as("v2u"), col("v").as("vv"),
          col("span").as("s2")), col("a.v") === col("v2u"), "left")
        .select(col("a.u").as("u"), coalesce(col("vv"), col("a.v")).as("v"),
          (col("a.span") + coalesce(col("s2"), lit(0L))).as("span"))
        .transform(graft.core.Lineage.cut)
    }
    val out = state
      .join(nxt0.select(col("u").as("cur"), lit(true).as("__more")), Seq("cur"), "left")
      .select(col("url"),
        when(col("__more").isNull, col("cur")).otherwise(col("url")).as("final_url"),
        when(col("__more").isNull, col("hops")).otherwise(lit(-1L)).as("hops"),
        col("__more").isNull.as("resolved"))
    // materialize BEFORE dropping nxt0's cache — `out` is lazy and still
    // reads nxt0 (the terminal-membership probe); unpersisting first would
    // recompute the redirect aggregation at the caller's action
    val cut = graft.core.Lineage.cut(out)
    nxt0.unpersist(blocking = false)
    cut
  }

  /**
   * One row per normalized url: the row with the greatest `tsCol`, ties
   * broken by greatest `idCol`. Output: `url_norm` plus every original
   * column of the winning row.
   */
  def latestSnapshot(pages: DataFrame, urlCol: String, tsCol: String,
                     idCol: String): DataFrame = {
    val cols = pages.columns.toIndexedSeq
    pages
      .groupBy(normalizeUrl(col(urlCol)).as("url_norm"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(tsCol), col(idCol))).as("w"))
      .select(col("url_norm") +: cols.map(c => col(s"w.$c").as(c)): _*)
  }
}
