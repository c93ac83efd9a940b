package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Adjacency, Graph}

/** Plan-hygiene tool: prints the formatted physical plans of the hot paths
 * (PageRank superstep, triangle join, parquet scan pruning) so shuffle
 * placement / codegen spans / pushed filters can be eyeballed per round.
 * Usage: runMain graft.tools.Explain */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = graft.gen.GraphGen.rmat(spark, 14, 8, seed = 3).cache()
    edges.count()

    println("==== PageRank superstep: state ⋈ adjacency -> explode -> agg ====")
    val adj = Adjacency.build(edges).persist()
    adj.count()
    val state = Graph.vertices(edges).select(col("vid"), lit(0.1).as("stored"))
      .persist()
    state.count()
    val msgs = adj.join(state.hint("shuffle_hash"), adj("src") === state("vid"))
      .select(explode(col("nbrs")).as("vid"), col("stored"))
      .groupBy("vid").agg(sum("stored").as("mbox"))
    msgs.explain("formatted")

    println("==== WCC superstep: delta scatter -> min-agg -> state update (shuffle_hash both) ====")
    // mirrors one ConnectedComponents.run step (pointer jump off, sparse
    // frontier): the post-cut state carries no stats, so WITHOUT the hints
    // the planner falls back to sort-merge and re-sorts both O(V) sides
    // every superstep
    val comp = Graph.vertices(edges)
      .select(col("vid"), col("vid").as("comp"), lit(true).as("changed"), lit(1L).as("deg"))
      .persist()
    comp.count()
    val pushFrom = comp.filter(col("changed"))
    val candMsgs = adj.join(pushFrom.hint("shuffle_hash"), adj("src") === pushFrom("vid"))
      .select(explode(col("nbrs")).as("vid"), col("comp"))
      .groupBy("vid").agg(min("comp").as("cand"))
    comp.select(col("vid"), col("comp"), col("deg"))
      .join(candMsgs.hint("shuffle_hash"), Seq("vid"), "left")
      .select(col("vid"), col("deg"), col("comp").as("old"),
        least(col("comp"), coalesce(col("cand"), col("comp"))).as("m"))
      .explain("formatted")

    println("==== BFS frontier scatter (top-down, shuffle_hash on the frontier) ====")
    val frontier = Graph.vertices(edges).limit(100).select(col("vid")).persist()
    frontier.count()
    adj.join(frontier.hint("shuffle_hash"), adj("src") === frontier("vid"))
      .select(explode(col("nbrs")).as("vid")).distinct()
      .explain("formatted")

    println("==== ngram-jaccard bitmap verify (candidates ⋈ bitmaps, zip_with/bit_count) ====")
    graft.dedup.Dedup.ngramJaccardPairs(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      n = 5, threshold = 0.5).explain("formatted")

    println("==== Triangle wedge join ====")
    graft.alg.TriangleCount.triangles(graft.alg.TriangleCount.canonical(edges))
      .explain("formatted")

    println("==== k-truss peel round: triangles -> canonical side support -> keep ====")
    val canon = graft.alg.TriangleCount.canonical(edges).persist()
    canon.count()
    val tris = graft.alg.TriangleCount.triangles(canon)
    val sides = tris.select(col("a").as("x"), col("b").as("y"))
      .union(tris.select(col("a").as("x"), col("c").as("y")))
      .union(tris.select(col("b").as("x"), col("c").as("y")))
    val supp = sides
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("supp"))
    canon.join(supp, Seq("a", "b"), "left")
      .filter(coalesce(col("supp"), lit(0L)) >= 2).select("a", "b")
      .explain("formatted")

    println("==== random-walk step: hash-index join + element_at (no aggregation) ====")
    // mirrors one RandomWalk.walks step (the real loop cuts each step so its
    // result plan is just cut-RDD scans). The argmin-over-neighbors
    // formulation was rejected: min(struct) is not hash-aggregable, so it
    // planned a SortAggregate over every frontier edge; this positional-
    // index form touches O(walks) rows per step
    import org.apache.spark.sql.expressions.Window
    val chunkSize = 4096
    val posAdj = edges.select("src", "dst").distinct()
      .select(col("src"), col("dst"),
        (row_number().over(Window.partitionBy("src").orderBy("dst")).cast("long") - 1L).as("rn"),
        count(lit(1)).over(Window.partitionBy("src")).as("deg"))
      .groupBy(col("src"), (col("rn") / chunkSize).cast("long").as("chunk"))
      .agg(first("deg").as("deg"), sort_array(collect_list(col("dst"))).as("nbrs"))
      .repartition(col("src")).persist()
    posAdj.count()
    val keyed = Graph.vertices(edges).limit(500)
      .select(col("vid").as("walk"), col("vid"),
        conv(substring(md5(concat_ws("|", lit(42L), col("vid"), lit(1))), 1, 12), 16, 10)
          .cast("long").as("__h"))
    keyed.hint("shuffle_hash").join(posAdj, keyed("vid") === posAdj("src"))
      .withColumn("__i", pmod(col("__h"), col("deg")))
      .filter(col("chunk") === (col("__i") / chunkSize).cast("long"))
      .select(col("walk"), lit(1).as("step"),
        element_at(col("nbrs"), (pmod(col("__i"), lit(chunkSize)) + 1).cast("int")).as("vid"))
      .explain("formatted")

    println("==== Boruvka MSF phase: live-set min-key agg + roots relabel ====")
    // mirrors one Msf.run phase over the LIVE edge-list state (round-4
    // shape: the state carries endpoint component labels; no phase ever
    // re-joins the full edge table against a vertex-label frame)
    val aC = least(col("src"), col("dst")); val bC = greatest(col("src"), col("dst"))
    val liveState = edges.filter(col("src") =!= col("dst"))
      .select(aC.as("a"), bC.as("b"), ((aC * 7 + bC * 13) % 1000).as("w"))
      .groupBy("a", "b").agg(min("w").as("w"))
      .select(col("a"), col("b"), col("w"),
        (col("w") * 4398046511104L + col("a") * 2097152L + col("b")).as("key"),
        col("a").as("ca"), col("b").as("cb"))
      .persist()
    liveState.count()
    liveState.select(col("ca").as("comp"), col("key"))
      .unionByName(liveState.select(col("cb").as("comp"), col("key")))
      .groupBy("comp").agg(min("key").as("mk"))
      .explain("formatted")
    val rootsM = liveState.select(col("ca").as("c"), least(col("ca"), col("cb")).as("p"))
      .groupBy("c").agg(min("p").as("p")).persist()
    rootsM.count()
    liveState
      .join(rootsM.select(col("c").as("ca"), col("p").as("__ra")).hint("shuffle_hash"), Seq("ca"))
      .join(rootsM.select(col("c").as("cb"), col("p").as("__rb")).hint("shuffle_hash"), Seq("cb"))
      .filter(col("__ra") =!= col("__rb"))
      .select(col("a"), col("b"), col("w"), col("key"),
        col("__ra").as("ca"), col("__rb").as("cb"))
      .explain("formatted")

    println("==== Boruvka MSF contraction: pointer-doubling self-join (comp-level, no edges) ====")
    val par = Graph.vertices(edges)
      .select(col("vid").as("c"), (col("vid") % 97).as("p")).persist()
    par.count()
    par.join(par.select(col("c").as("__p2"), col("p").as("__pp")).hint("shuffle_hash"),
        col("p") === col("__p2"))
      .select(col("c"), col("__pp").as("p"), (col("p") =!= col("__pp")).as("__ch"))
      .explain("formatted")

    println("==== k-means assign pass: literal centers, argmin projection (no join) ====")
    // mirrors KMeans.assign: centers are driver-held literals folded into a
    // least(struct...) projection — the whole assign step is one narrow
    // codegen'd pass, no exchange
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val ctrs = Array.fill(4)(Array.tabulate(64)(_.toDouble / 64))
    val selfDot = aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val scoredC = ctrs.zipWithIndex.map { case (c, i) =>
      val dotC = aggregate(zip_with(col("e"), lit(c), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      struct(round(selfDot - lit(2.0) * dotC + lit(c.map(x => x * x).sum), 9).as("dist2"),
        lit(i).as("cid"))
    }
    emb.select(col("vec_id"), least(scoredC: _*).getField("cid").as("cid"))
      .explain("formatted")

    println("==== k-means update: posexplode -> partial-agg-capped groupBy(cid,pos) ====")
    emb.select(lit(0).as("cid"), posexplode(col("e")))
      .groupBy("cid", "pos").agg(round(avg(col("col")), 6).as("v"))
      .explain("formatted")

    println("==== node2vec step: candidates ⋈ grouped-adjacency probe -> per-walk windows ====")
    // mirrors one RandomWalk.biasedWalks step (round-5 shape): candidates
    // from the edge join, membership via array_contains against the
    // persisted grouped SORTED out-list — the V-row build side arrives in
    // its groupBy's own HashPartitioning, so the step's only exchange on
    // the membership side is the candidate stream's shuffle on `prev`
    val e2 = edges.select("src", "dst").distinct().repartition(col("src")).persist()
    e2.count()
    // the real loop's state is a Lineage.cut frame (fresh attributes);
    // mirror that here or the membership probe is an ambiguous self-join
    val st = graft.core.Lineage.cut(Graph.vertices(edges).limit(500)
      .select(col("vid").as("walk"), col("vid").as("prev"), col("vid")))
    val grouped2 = e2.groupBy(col("src").as("p2"))
      .agg(sort_array(collect_list(col("dst"))).as("pns")).persist()
    grouped2.count()
    val cand2 = st.hint("shuffle_hash").join(e2, st("vid") === e2("src"))
      .select(col("walk"), col("prev"), st("vid").as("cur"), e2("dst").as("nbr"))
    val weighted = cand2.hint("shuffle_hash")
      .join(grouped2, cand2("prev") === grouped2("p2"), "left")
      .select(col("walk"), col("prev"), col("cur"), col("nbr"),
        when(col("nbr") === col("prev"), lit(0.5))
          .when(array_contains(col("pns"), col("nbr")), lit(1.0))
          .otherwise(lit(2.0)).as("wt"))
    val hN = conv(substring(md5(concat_ws("|", lit(42L), col("walk"), lit(1))), 1, 12),
      16, 10).cast("long")
    weighted
      .withColumn("cum", sum(col("wt")).over(Window.partitionBy("walk").orderBy("nbr")))
      .withColumn("t", (hN.cast("double") / lit(281474976710656.0)) *
        sum(col("wt")).over(Window.partitionBy("walk")))
      .filter(col("cum") > col("t") && col("cum") - col("wt") <= col("t"))
      .select(col("walk"), col("cur").as("prev"), col("nbr").as("vid"))
      .explain("formatted")

    println("==== bow-tie reachability sweep: frontier ⋈ adjacency -> explode -> anti-join visited ====")
    // mirrors one BowTie.reachable level: the adjacency is the SAME
    // persisted frame all four sweeps share; visited is a Lineage.cut
    // frame, so the anti-join needs no hint (tiny build side)
    val visited = graft.core.Lineage.cut(Graph.vertices(edges).limit(100))
    adj.join(visited.hint("shuffle_hash"), adj("src") === visited("vid"))
      .select(explode(col("nbrs")).as("vid")).distinct()
      .join(visited.hint("shuffle_hash"), Seq("vid"), "left_anti")
      .explain("formatted")

    println("==== reciprocity: edge-keyed self-join on the swapped table + one aggregate ====")
    val eDir = edges.select("src", "dst").distinct().filter(col("src") =!= col("dst"))
    val rev = eDir.select(col("dst").as("src"), col("src").as("dst"))
      .withColumn("__r", lit(1L))
    eDir.join(rev, Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("edges"),
        sum(coalesce(col("__r"), lit(0L))).as("reciprocated"))
      .explain("formatted")

    println("==== pruned-LabelRank support cut: TopKStructs bounded top-k ====")
    // mirrors the per-iteration argmax+prune of LabelPropagation.labelRank
    // (pruneTopK=16): the custom TypedImperativeAggregate runs in
    // ObjectHashAggregate with an O(k) buffer per vertex — vs collect_list
    // (O(support) buffers) or min/max(struct) (SortAggregate fallback)
    val sup = spark.range(100000).select((col("id") % 1000).as("vid"),
      (col("id") % 37).as("l"), (col("id") % 97 / lit(97.0)).as("p"))
    sup.groupBy("vid").agg(graft.functions.TopKStructs.topK(
        -round(col("p"), 12), col("l"), col("p"), 16).as("topk"))
      .explain("formatted")

    println("==== substring-dedup census: window explode -> count+min(packed key) agg ====")
    // mirrors Dedup.dedupSubstrings' heavy half: one explode of O(tokens)
    // occurrence rows into a map-side-combinable census — the same
    // partial-HashAggregate-before-Exchange shape as the paragraph dedup
    val docsT = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"),
        regexp_extract_all(lower(col("text")), lit("[^ \\t\\n\\r]+"), lit(0)).as("t"))
    val occX = docsT.filter(size(col("t")) >= 8)
      .select(col("id"), explode(transform(sequence(lit(1), size(col("t")) - 7),
        s => struct(s.as("s"), md5(concat_ws(" ", slice(col("t"), s, lit(8)))).as("h"))))
        .as("o"))
      .select(col("id"), col("o.s").as("s"), col("o.h").as("h"))
    occX.groupBy("h").agg(count(lit(1)).as("c"),
        min(col("id") * lit(1048576L) + col("s")).as("wkey"))
      .explain("formatted")

    println("==== corpus top-ngrams: (gram,doc) pre-agg -> gram agg -> TakeOrdered ====")
    graft.text.Repetition.corpusTopNgrams(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", n = 3, k = 50)
      .explain("formatted")

    println("==== butterfly census: right-pivot wedge self-join -> per-pair agg ====")
    val bip = edges.select(col("src"), (col("dst") % 512 + 1000000L).as("dst")).distinct()
    graft.alg.Butterfly.perVertex(bip).explain("formatted")

    println("==== sequence packing: ONE exchange + in-partition sort + mapPartitions ====")
    graft.text.Curation.packSequences(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      col("doc_id"), length(col("text")) / 5, capTokens = 512, buckets = 8)
      .explain("formatted")

    println("==== DAG layering superstep: max scatter-reduce (WCC grammar) ====")
    // mirrors one Dag.layers step: frontier join + explode + max agg + state
    // update, shuffle_hash on both joins
    val lstate = graft.core.Lineage.cut(Graph.vertices(edges)
      .select(col("vid"), lit(0L).as("layer"), lit(true).as("changed"), lit(1L).as("deg")))
    val lmsgs = adj.join(lstate.filter(col("changed")).hint("shuffle_hash"),
        adj("src") === lstate("vid"))
      .select(explode(col("nbrs")).as("vid"), (col("layer") + 1L).as("cand"))
      .groupBy("vid").agg(max("cand").as("cand"))
    lstate.select(col("vid"), col("layer"), col("deg"))
      .join(lmsgs.hint("shuffle_hash"), Seq("vid"), "left")
      .select(col("vid"),
        greatest(col("layer"), coalesce(col("cand"), col("layer"))).as("layer"), col("deg"))
      .explain("formatted")

    println("==== conductance: symmetrize + 2 vid joins + k-row agg + 1-row broadcast ====")
    val parts = Graph.vertices(edges).select(col("vid"), (col("vid") % 4).as("part"))
    graft.core.Partitioning.conductance(edges, parts).explain("formatted")

    println("==== rich club: two histograms + 17-row range join ====")
    Graph.richClub(edges, maxK = 16).explain("formatted")

    println("==== eigenvector round: scatter-reduce + O(1)-row norm broadcast ====")
    val eraw = state.select(col("vid"), col("stored").as("m"))
    val enorm = eraw.agg(sqrt(sum(col("m") * col("m"))).as("nrm"))
    eraw.crossJoin(broadcast(enorm))
      .select(col("vid"),
        when(col("nrm") > 0, col("m") / col("nrm")).otherwise(0.0).as("eigen"))
      .explain("formatted")

    println("==== delta-stepping relax: bucket-filtered frontier, sssp grammar ====")
    val dwe = edges.withColumn("weight", ((col("src") + col("dst")) % 7 + 1).cast("double"))
      .persist()
    dwe.count()
    val dstate = Graph.vertices(edges)
      .select(col("vid"), (col("vid") % 40).cast("double").as("dist"), lit(true).as("pending"))
      .persist()
    dstate.count()
    val dfrontier = dstate.filter(col("pending") && col("dist") < 4.0)
    dwe.join(dfrontier.hint("shuffle_hash"), dwe("src") === dfrontier("vid"))
      .select(col("dst").as("vid"), (col("dist") + col("weight")).as("nd"))
      .groupBy("vid").agg(min("nd").as("nd"))
      .explain("formatted")

    println("==== priority sample: TakeOrderedAndProject (no global sort) ====")
    graft.text.Curation.prioritySample(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        col("doc_id"), length(col("text")) + lit(1), k = 100)
      .explain("formatted")

    println("==== as-of join, window strategy: ONE key exchange, no join node ====")
    val evA = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    graft.operators.AsOfJoin.asof(
        evA.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        evA.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("pv")),
        key = "user_id", ts = "ts", payload = Seq("pv"))
      .explain("formatted")

    println("==== as-of join, bucketed strategy: (key,bucket) join + max_by, hot keys split ====")
    val evMs = unix_millis(col("ts").cast("timestamp")).as("tms")
    graft.operators.AsOfJoin.asofBucketed(
        evA.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), evMs),
        evA.filter(col("event_type") === "purchase")
          .select(col("user_id"), evMs, col("value").as("pv")),
        key = "user_id", ts = "tms", leftId = "event_id", payload = Seq("pv"),
        toleranceMs = 86400000L, bucketMs = 86400000L)
      .explain("formatted")

    println("==== BPE pair counts: corpus scan -> word-freq agg -> pair agg -> TakeOrdered ====")
    graft.text.Tokenize.charPairCounts(
        graft.text.Tokenize.wordFreq(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text"),
        k = 100)
      .explain("formatted")

    println("==== incremental minhash: new-side probe of band buckets (old×old never joins) ====")
    val docsI = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sNew = col("doc_id") % 5 === 0
    graft.dedup.MinHash.incrementalNearDupPairs(
        graft.dedup.MinHash.md5Signatures(docsI.filter(!sNew), k = 8, n = 5),
        graft.dedup.MinHash.md5Signatures(docsI.filter(sNew), k = 8, n = 5),
        bands = 4, threshold = 0.5)
      .explain("formatted")

    println("==== BPE encode: |merges| vocab folds + word-keyed join back + per-doc agg ====")
    val docsE = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.text.Tokenize.encode(docsE, "doc_id", "text",
        Seq("t" -> "h", "th" -> "e").zipWithIndex.map { case ((a, b), i) =>
          graft.text.Tokenize.Merge(i, a, b, 0L) })
      .explain("formatted")

    println("==== temperature mix: k-row rate agg + broadcast join + codegen'd filter ====")
    graft.text.Curation.temperatureMix(docsE, col("lang"), col("doc_id"),
        tau = 0.3)
      .explain("formatted")

    println("==== DSIR weights: 2 corpus scans -> bucket-model agg -> broadcast ratio join -> per-doc agg ====")
    graft.text.Dsir.importanceWeights(docsE, "doc_id", "text",
        isTarget = col("lang") === "en")
      .explain("formatted")

    println("==== walk context pairs: ONE walk-keyed agg + codegen'd pair expansion (no walk^2 join) ====")
    graft.alg.RandomWalk.contextPairs(
        graft.alg.RandomWalk.walks(edges, Graph.vertices(edges).limit(64),
          length = 4, seed = 1L), window = 2)
      .groupBy("center", "context").count()
      .explain("formatted")

    println("==== feature smoothing round: edge join + (vid,pos) sum+count + blend join (PageRank plan x dim) ====")
    // the REAL round builder (the loop cuts lineage per round, so explaining
    // its output would show only the frozen RDD — explain the round itself)
    val embE = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val undE = Graph.undirected(edges.filter(col("src") < 500 && col("dst") < 500))
      .filter(col("src") =!= col("dst"))
    val stE = embE
      .select(col("vec_id").as("vid"), posexplode(col("embedding")).as(Seq("p0", "v")))
      .select(col("vid"), (col("p0") + 1).cast("long").as("pos"),
        floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("uv"))
    graft.ann.FeatureProp.round(undE, stE, alpha = 0.5)
      .explain("formatted")

    println("==== k-hop GNN sampler hop: frontier semi-join + salted top-k ====")
    graft.core.Graph.sampleKHop(edges,
        Graph.vertices(edges).limit(64), fanouts = Seq(3, 2))
      .groupBy("hop").count()
      .explain("formatted")

    println("==== triad census: dyad bit_or agg + wedge join + 3 pair joins + 7-group agg ====")
    graft.alg.TriangleCount.directedCensus(edges.filter(col("src") < 2000))
      .explain("formatted")

    println("==== PCA covariance: posexplode^2 -> d(d+1)/2-group BIGINT agg + 2 broadcast joins ====")
    graft.ann.Pca.covariance(embE).explain("formatted")

    println("==== int8 quantize: d-row codebook broadcast + narrow affine pass ====")
    graft.ann.Quantize.codes(embE).explain("formatted")

    println("==== chunk windows: sequence+explode fan-out, zero exchanges ====")
    graft.text.Curation.chunkWindows(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        col("doc_id"), col("text"), window = 64, stride = 48)
      .explain("formatted")

    println("==== interval join (batch form): key hash join + range predicate, no cartesian ====")
    val evE = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    graft.streaming.EventStream.intervalJoin(
        evE.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id")),
        evE.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts").as("view_ts"), col("user_id")),
        "user_id", "click_ts", "view_ts", lookback = "30 minutes")
      .explain("formatted")

    println("==== suffix blocklist: O(labels) suffix explode + broadcast hash join ====")
    graft.text.UrlOps.suffixBlock(docsE, col("doc_id"),
        concat(lit("src"), (col("doc_id") % 20).cast("string"), lit(".example.org")),
        Seq("src3.example.org").toDF("suffix"))
      .explain("formatted")

    println("==== length profile: ONE exchange, exact percentile buffers per group ====")
    graft.text.Curation.profile(docsE, col("source"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("double"))
      .explain("formatted")

    println("==== margin mining: 3 broadcast-side corpus scans, no corpus shuffle ====")
    graft.ann.Ann.marginTopK(embE,
        embE.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding")),
        k = 5, m = 3)
      .explain("formatted")

    println("==== sliding windows: one Expand (2 rows/event) + hash agg ====")
    graft.streaming.EventStream.slidingCounts(evE).explain("formatted")

    println("==== Parquet scan pruning (documents: 2 columns of 5) ====")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id"), length(col("text")))
      .explain("formatted")

    spark.stop()
  }
}
