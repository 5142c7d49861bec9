package graft

import graft.queries.{CoreQueries, JoinQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the scale posture is part of correctness.
  * Pushdown must reach the parquet scan, top-k ranks must plan as
  * WindowGroupLimit (bounded, not full-cardinality single-partition
  * windows), and dimension joins must broadcast.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(q: graft.Q): String =
    q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("q04 pushes filter and projection to the parquet scan") {
    val p = plan(CoreQueries.q04ScanProject)
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity,30.0)"), p)
    assert(!p.contains("l_shipdate"), "projection not pruned:\n" + p)
  }

  // rank<=k must prune BELOW the window: either LimitPushDownThroughWindow
  // (TakeOrderedAndProject under Window) or WindowGroupLimit. Both cap what
  // funnels into the single-partition window at k rows.
  private def boundedRank(p: String): Boolean =
    p.contains("WindowGroupLimit") ||
      "TakeOrderedAndProject.*\n.*FileScan|Window.*\\n.*TakeOrderedAndProject".r.findFirstIn(p).isDefined ||
      (p.contains("Window") && p.contains("TakeOrderedAndProject"))

  test("q05 top-k rank is bounded below the window") {
    val p = plan(CoreQueries.q05TopK)
    assert(boundedRank(p), p)
  }

  test("q02 grep rank is bounded below the window") {
    val p = plan(CoreQueries.q02Grep)
    assert(boundedRank(p), p)
  }

  test("q34b bloom lookup pushes the IN filter to the parquet scan") {
    val p = plan(graft.queries.StoreQueries.q34bBloomFile)
    assert(p.contains("PushedFilters: [In(value"), p)
  }

  test("q10 dimension join broadcasts (no shuffle of the fact side for nation)") {
    val p = plan(JoinQueries.q10JoinInner)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q77 collocation rank is bounded below the global window") {
    val p = plan(graft.queries.TextQueries.q77Collocations)
    assert(boundedRank(p), p)
  }

  test("q78 joins the 5-row stats side as a broadcast, never a shuffle") {
    val p = plan(graft.queries.AggQueries.q78ZscoreOutliers)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q76 stratified sample scans documents once with pruned columns") {
    val p = plan(graft.queries.TextQueries.q76StratifiedSplit)
    // anchor to the scan's ReadSchema — a whole-plan substring check would
    // trip on paths/aliases containing 'text'
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(schema.contains("doc_id") && schema.contains("lang")
      && !schema.contains("text"), p)
  }

  // q58's registered query ends in a localCheckpoint, so its OWN executed
  // plan is just a Scan of the materialized RDD — the joins run inside
  // connectedComponents. Assert on the subtrees where a cartesian could
  // actually arise: the bucket-star edge build and one propagation round.
  test("q58 component subtrees join hash-to-hash, never cartesian") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val sig = Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), 16)
    val edges = Dedup.bucketStarEdges(Dedup.lshBands(sig, 8, 2))
    val p1 = edges.queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct")
      && !p1.contains("BroadcastNestedLoopJoin"), p1)
    val labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
    val round = edges.alias("e")
      .join(labels.alias("l"), col("e.b") === col("l.id"))
      .groupBy(col("e.a")).agg(min(col("l.lbl")))
    val p2 = round.queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct")
      && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("partitioned layout prunes partitions at the scan") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-prune-test"
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val p = spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"), p)
    assert(!p.contains("Filter (o_orderstatus"), "filter should be pruned, not post-scan:\n" + p)
  }

  test("q110 delta-bucket prune is a broadcast left-semi before the pair window") {
    // the incremental dedup's old-only-bucket prune must build on the
    // small delta key set (broadcast at test scale; engine-degraded to a
    // shuffle semi if a huge delta outgrows broadcast) and must sit
    // BELOW the windowed pair listing so pruned buckets never reach it.
    // AQE's initial plan is conservative — execute, then read the final.
    val df = graft.queries.DedupQueries.q110IncrementalDedup
      .run(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      "delta-touched-bucket prune must plan as a broadcast left-semi:\n" +
        p.take(2000))
  }

  test("q69 as-of join plans as one window, never a join") {
    // the whole point of the union+window shape: NO join operator at all —
    // a per-row inequality join would explode at 100 TB
    val p = plan(JoinQueries.q69AsofJoin)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), "as-of must not plan a join:\n" + p)
  }

  test("q80 range join is a bucketed equi-join, never a cartesian") {
    // even with broadcast disabled (forcing the large-large strategy) the
    // band join must stay an equi-join on (key, bucket)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(JoinQueries.q80RangeJoin)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q89 joins the 3-row group-size side as a broadcast, never a shuffle") {
    val p = plan(graft.queries.AggQueries.q89Percentiles)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q124 ivf-sq8 probes and queries ride broadcasts; the only cross join is the bounded centroid assignment") {
    val p = plan(graft.queries.SimilarityQueries.q124IvfSq8Ann)
    // the candidate join (codes x probes) and the scoring join (x queries)
    // must be broadcast hash joins — the corpus side never reshuffles
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), "corpus reshuffled for the probe join:\n" + p.take(3000))
    // cells x corpus cross joins are the intended bounded assignment scans
    // (cells ~ sqrt(N) broadcast rows per corpus row, linear total work);
    // anything beyond the two assignment sites (corpus + query) is a bug
    val crosses = "BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(p).size
    assert(crosses <= 2, s"unexpected extra cross join ($crosses):\n" + p.take(3000))
  }

  test("q150b hybrid RAG: chunk corpus never reshuffles for the dense side") {
    val p = plan(graft.queries.TextQueries.q150bRagHybrid)
    // probes, queries, BM25's qt/df/tot sides all broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the ONLY sort-merge allowed is the bounded 20 ∪ 20 fusion
    // full-outer; a sort-merge anywhere else means the chunk corpus
    // (the codes table at scale) reshuffled for a bounded side
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val smjFullOuter = "SortMergeJoin .*FullOuter".r.findAllIn(p).size
    assert(smj == smjFullOuter,
      s"non-fusion sort-merge join ($smj vs $smjFullOuter):\n" + p.take(3000))
    // every cross join must broadcast its bounded side (assignment /
    // probe / stats sites); a non-broadcast cartesian means two
    // corpus-sized sides met
    assert(!p.contains("CartesianProduct"),
      "corpus-sized cartesian:\n" + p.take(3000))
  }

  test("q150c RAG serve consumes artifacts: broadcast query sides, no corpus reshuffle") {
    val p = plan(graft.queries.TextQueries.q150cRagServe)
    // the serve path's only per-batch joins are the query-term joins
    // against the persisted postings and the probe-pruned code scan —
    // all bounded sides broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // same discipline as q150b: the only sort-merge allowed is the
    // bounded 20 ∪ 20 fusion full-outer
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val smjFullOuter = "SortMergeJoin .*FullOuter".r.findAllIn(p).size
    assert(smj == smjFullOuter,
      s"non-fusion sort-merge join ($smj vs $smjFullOuter):\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"),
      "corpus-sized cartesian:\n" + p.take(3000))
  }

  test("q127 pagerank and q128 set-sim join never plan a cartesian") {
    // both are equi-join families: pagerank's per-iteration (src) joins
    // and set-sim's prefix-token + verify joins must all key-match — a
    // nested-loop anywhere means the pruning structure was lost
    for (q <- Seq(graft.queries.DedupQueries.q127Pagerank,
        graft.queries.DedupQueries.q128SetsimJoin)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} planned a nested loop:\n" + p.take(3000))
    }
  }

  test("q149 star join broadcasts its dims and pushes the status filter; no cartesian") {
    val p = plan(graft.queries.JoinQueries.q149StarJoin)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the o_orderstatus = 'F' predicate must reach the orders scan
    assert(p.contains("EqualTo(o_orderstatus,F)"), p.take(3000))
  }

  test("q133 merge/upsert never shuffles the snapshot: broadcast left-anti") {
    val p = plan(graft.queries.DedupQueries.q133MergeUpsert)
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      "upsert must anti-join against a broadcast of the touched keys:\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("FullOuter"),
      "snapshot-wide shuffle or full-outer crept into the merge:\n" + p.take(3000))
  }

  test("q129 bm25 top-10 is TakeOrderedAndProject; scoring rides broadcasts") {
    val p = plan(graft.queries.TextQueries.q129Bm25)
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must be a distributed bounded sort, not a global window:\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "query-term/df/dl sides must broadcast at this scale:\n" + p.take(3000))
  }

  test("q132 profiler: ndv Expand is counts-only (hash agg, no sort); min/max ride a second un-expanded scan") {
    // round 20: the exact-ndv Expand and the min/max(string) pass SPLIT —
    // fused, the string min/max buffers forced SortAggregate, i.e. a full
    // 6-key SORT of the (k+1)x expanded stream; split, the Expand side
    // hash-aggregates (counts only) and min/max run single-group over the
    // un-expanded scan. Two column-pruned scans beat sorting the expanded
    // stream at any scale.
    val p = plan(graft.queries.MiscQueries.q132Profile)
    assert(p.contains("Expand"), "multi-distinct should compile to Expand:\n" + p.take(2000))
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      "profiler reads lineitem once per pass (ndv + min/max):\n" + p.take(3000))
    assert(!p.contains("Sort "),
      "no sort anywhere: the Expand side must stay hash-aggregable:\n" + p.take(3000))
  }

  // "Window [" matches only plain WindowExec nodes (WindowGroupLimit
  // prints without the space-bracket)
  private def windowCount(p: String): Int = "Window \\[".r.findAllIn(p).size

  test("q159 range frame is exactly one partitioned window, no group-limit fallback") {
    val p = plan(graft.queries.SortQueries.q159RangeFrame)
    assert(windowCount(p) == 1,
      s"expected exactly one WindowExec, got ${windowCount(p)}:\n" + p.take(3000))
    assert("Window \\[.*\\], \\[user_id".r.findFirstIn(p).isDefined,
      "the window must partition by user_id (a global RANGE frame would serialize):\n" + p.take(3000))
    assert(!p.contains("WindowGroupLimit"), "no rank limit exists to push:\n" + p.take(2000))
  }

  test("q163 dense_rank top-k plans WindowGroupLimit (map-side prune)") {
    val p = plan(graft.queries.SortQueries.q163TopTies)
    assert(p.contains("WindowGroupLimit"),
      "dense_rank <= k must prune below the window exactly like row_number:\n" + p.take(3000))
  }

  test("q161 as-of attribution is one window and zero joins") {
    val p = plan(graft.queries.JoinQueries.q161Attribution)
    assert(windowCount(p) == 1,
      s"asOf must be ONE running-last window, got ${windowCount(p)}:\n" + p.take(3000))
    assert(!p.contains("Join"),
      "asOf must be a tagged union + window, never an inequality join:\n" + p.take(3000))
  }

  test("q164 new-term anti join degrades to a shuffle join, never a nested loop") {
    // at test scale the distinct vocab fits under the broadcast threshold
    // and Catalyst rightly broadcasts it; disable the shortcut to assert
    // the 100 TB strategy — the vocab anti join is EQUI-keyed on term, so
    // with an unbounded build side it must shuffle, not broadcast a
    // corpus-sized vocabulary or fall to a nested loop
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(graft.queries.TextQueries.q164NewTerms)
      assert(("SortMergeJoin .*LeftAnti".r.findFirstIn(p).isDefined ||
        "ShuffledHashJoin .*LeftAnti".r.findFirstIn(p).isDefined),
        "the anti join must key-match on term:\n" + p.take(3000))
      assert(!p.contains("BroadcastExchange") &&
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "no broadcast of the unbounded vocab, no nested loop:\n" + p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q165 fact scan carries a dynamic partition pruning filter") {
    // the whole point of the partitioned layout: the month-partitioned
    // fact scan must show dynamicpruningexpression in its PartitionFilters
    // (runtime pruning from the broadcast dim), and the dim join must
    // reuse that broadcast — not launch a separate pruning job
    val p = plan(JoinQueries.q165DppPrune)
    assert(p.contains("dynamicpruning"),
      "no dynamic partition pruning on the fact scan:\n" + p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
  }

  test("q166 blocking join is equi-keyed: no cartesian, no nested loop") {
    val p = plan(graft.queries.DedupQueries.q166EntityResolution)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate pairing must ride the block equi-join:\n" + p.take(3000))
  }

  test("q167 knn graph bounds the per-vector rank and never goes cartesian") {
    // the bounded-rank window sits behind knnGraph's checkpoint, so
    // assert it on the exposed directed stage; the full query plan is
    // checked for the cartesian ban
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val cents = emb.filter(col("vec_id") < 23)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val pd = Similarity.knnDirected(corpus, cents, 5, 3)
      .queryExecution.executedPlan.toString
    assert(pd.contains("WindowGroupLimit"),
      "per-vector top-k must prune map-side:\n" + pd.take(3000))
    val p = plan(graft.queries.SimilarityQueries.q167KnnGraph)
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q167b SQ8-served knn graph bounds the rank and scores codes via equi joins") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val cents = emb.filter(col("vec_id") < 23)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val pd = Similarity.knnDirectedSq8(corpus, cents, 5, 3)
      .queryExecution.executedPlan.toString
    assert(pd.contains("WindowGroupLimit"),
      "per-vector top-k must prune map-side:\n" + pd.take(3000))
    // the code store joins on xid/nid equi keys — a cartesian anywhere
    // means the reconstruction got re-inlined into the scoring join
    assert(!pd.contains("CartesianProduct"), pd.take(3000))
    val p = plan(graft.queries.SimilarityQueries.q167bKnnGraphSq8)
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q167c capped knn graph bounds rank AND per-cell servable lists, never cartesian") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val cents = emb.filter(col("vec_id") < 23)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val pd = Similarity.knnDirectedSq8(corpus, cents, 5, 3, capPerCell = 22L)
      .queryExecution.executedPlan.toString
    // two bounded windows: the per-vector top-k AND the per-cell cap —
    // both must prune map-side (WindowGroupLimit), neither may be global
    assert("WindowGroupLimit".r.findAllIn(pd).size >= 2,
      "per-vector top-k and per-cell cap must both prune map-side:\n" + pd.take(3000))
    assert(!pd.contains("CartesianProduct"), pd.take(3000))
    val p = plan(graft.queries.SimilarityQueries.q167cKnnGraphCapped)
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q167d incremental serve: touched cells broadcast, map-side top-k, never cartesian") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 100 =!= 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val delta = emb.filter(col("vec_id") % 100 === 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val cents = base.orderBy(col("xid")).limit(22)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))
    val idx = Similarity.knnGraphBuild(base, cents, 5, 3, 22L)
    // serve ends in a localCheckpoint (the q58 convention), so its own
    // executed plan is a Scan of the materialized directed list; assert
    // the scoring core's plan — the exact subtree serve re-scores
    // affected queries through — prunes its per-query top-k map-side
    val enc = idx.enc
    val ps = Similarity.scoreDirected(idx.probes, idx.servable, enc, idx.xn, 3)
      .queryExecution.executedPlan.toString
    assert(ps.contains("WindowGroupLimit"),
      "re-scored top-k must prune map-side:\n" + ps.take(3000))
    assert(!ps.contains("CartesianProduct"), ps.take(3000))
    val served = Similarity.knnGraphServe(idx, delta)
    served.collect()
    val p = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // nothing in the serve path may degenerate to a cartesian (the only
    // cross join in the family is the bounded centroid broadcast inside
    // cellRanked, checkpointed away before this plan)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    val q = plan(graft.queries.SimilarityQueries.q167dKnnGraphIncremental)
    assert(!q.contains("CartesianProduct"), q.take(3000))
  }

  test("q167e loaded index artifacts are FileScans — serve reads disk, not session lineage") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 100 =!= 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val cents = base.orderBy(col("xid")).limit(22)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))
    val idx = Similarity.knnGraphBuild(base, cents, 5, 3, 22L)
    val path = graft.core.Graft.scratch("planspec_knn_index")
    Similarity.knnIndexSave(idx, path)
    val loaded = Similarity.knnIndexLoad(spark, path)
    for ((df, what) <- Seq(
        (loaded.servable, "servable"), (loaded.assignD2, "assignD2"),
        (loaded.enc, "codes"), (loaded.xn, "vectors"),
        (loaded.probes, "probes"), (loaded.directed, "directed"),
        (loaded.centroids, "centroids"))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("FileScan parquet"),
        s"$what must be a parquet FileScan:\n" + p.take(2000))
      assert(!p.contains("ExistingRDD"),
        s"$what leaked in-session lineage:\n" + p.take(2000))
    }
    // and the cell-partitioned layout is real: a literal cell filter on
    // the member store prunes DIRECTORIES, not rows
    val one = loaded.servable.filter(col("cid") === 1L)
      .queryExecution.executedPlan.toString
    assert(one.contains("PartitionFilters: [") && one.contains("cid"),
      "cell filter must land in PartitionFilters:\n" + one.take(2000))
  }

  test("q150d disk serve prunes postings to term buckets and codes to probed cells") {
    import graft.queries.TextQueries
    val dir = TestSpark.sf0001
    val built = TextQueries.ragIndexBuild(spark, dir)
    val path = graft.core.Graft.scratch("planspec_rag_index")
    TextQueries.ragIndexSave(built, path)
    val idx = TextQueries.ragIndexLoad(spark, path)
    import org.apache.spark.sql.functions.col
    val sp = idx.postings.filter(col("tb").isin(3, 17, 41))
      .queryExecution.executedPlan.toString
    assert(sp.contains("FileScan parquet"), sp.take(2000))
    assert(sp.contains("PartitionFilters: [") && sp.contains("tb"),
      "term-bucket filter must prune partitions:\n" + sp.take(2000))
    val dp = idx.index.filter(col("cid").isin(1L, 2L))
      .queryExecution.executedPlan.toString
    assert(dp.contains("PartitionFilters: [") && dp.contains("cid"),
      "cell filter must prune the code store:\n" + dp.take(2000))
  }

  test("q150g retired index: bucket/cell pruning survives the tombstone anti-joins") {
    import graft.queries.TextQueries
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val path = graft.core.Graft.scratch("planspec_rag_retire")
    TextQueries.ragIndexSave(TextQueries.ragIndexBuildOf(docs), path)
    val idx = TextQueries.ragIndexRetire(TextQueries.ragIndexLoad(spark, path),
      docs.filter(col("doc_id") % 9 === 4).select(col("doc_id")))
    // the serve's isin sits on TOP of the retire's broadcast left-anti;
    // pushdown must carry it past the join into the FileScan's
    // PartitionFilters — else every post-delete serve rescans the store
    val sp = idx.postings.filter(col("tb").isin(3, 17, 41))
      .queryExecution.executedPlan.toString
    assert(sp.contains("FileScan parquet"), sp.take(3000))
    assert(sp.contains("PartitionFilters: [") && sp.contains("tb"),
      "bucket filter lost through the retire anti-join:\n" + sp.take(3000))
    val dp = idx.index.filter(col("cid").isin(1L, 2L))
      .queryExecution.executedPlan.toString
    assert(dp.contains("PartitionFilters: [") && dp.contains("cid"),
      "cell filter lost through the retire anti-join:\n" + dp.take(3000))
  }

  test("q150e appended index: the bucket filter prunes the base store through the union") {
    import graft.queries.TextQueries
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val path = graft.core.Graft.scratch("planspec_rag_append")
    TextQueries.ragIndexSave(
      TextQueries.ragIndexBuildOf(docs.filter(col("doc_id") % 50 =!= 49)), path)
    val app = TextQueries.ragIndexAppend(
      TextQueries.ragIndexLoad(spark, path), docs.filter(col("doc_id") % 50 === 49))
    // the serve's isin lands on a union of (loaded base store, delta
    // checkpoint); predicate pushdown must carry it through the Union
    // into the base FileScan's PartitionFilters — else every appended
    // session silently rescans the whole store
    val p = app.postings.filter(col("tb").isin(3, 17, 41))
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("tb"),
      "bucket filter lost through the union:\n" + p.take(3000))
    assert(p.contains("FileScan parquet"), p.take(3000))
  }

  test("q150f streamed index: bucket pruning survives the CHAINED micro-batch unions") {
    // the q150f shape — three RagIngest folds stack three Union layers
    // on the postings plan; the serve's isin must still reach the base
    // FileScan's PartitionFilters through ALL of them, or a long-running
    // ingest silently degrades every serve to a full-store scan
    import graft.queries.TextQueries
    import graft.streaming.RagIngest
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val path = graft.core.Graft.scratch("planspec_rag_stream")
    TextQueries.ragIndexSave(
      TextQueries.ragIndexBuildOf(docs.filter(col("doc_id") % 50 =!= 49)), path)
    val ingest = new RagIngest(TextQueries.ragIndexLoad(spark, path))
    val delta = docs.filter(col("doc_id") % 50 === 49)
    (0 until 3).foreach { r =>
      ingest.foldBatch(delta.filter(col("doc_id") % 3 === r), r.toLong)
    }
    val p = ingest.index.postings.filter(col("tb").isin(3, 17, 41))
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("tb"),
      "bucket filter lost through the chained unions:\n" + p.take(3000))
    assert(p.contains("FileScan parquet"), p.take(3000))
  }

  test("q170 versioned replay never shuffles the snapshot: broadcast anti per batch") {
    val p = plan(graft.queries.DedupQueries.q170TimeTravel)
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      "touched keys must ride a broadcast left-anti:\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin"), "snapshot side must not shuffle:\n" + p.take(3000))
  }

  test("q171 eval slice rides a broadcast; the corpus is never shuffled for scoring") {
    val p = plan(graft.queries.SimilarityQueries.q171SemanticDecon)
    // the deliberate broadcast cross product against the SMALL eval side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q172 overlap join meets on buckets: no cartesian, no nested loop") {
    val p = plan(JoinQueries.q172OverlapJoin)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval candidates must meet on the bucket equi-key:\n" + p.take(3000))
  }

  test("q173 skew audit top-10 is TakeOrderedAndProject over the count agg") {
    val p = plan(graft.queries.MiscQueries.q173SkewAudit)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q181 SCD2 point-in-time join is one window, never an interval join") {
    val p = plan(JoinQueries.q181Scd2Join)
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the as-of must not degrade to an interval/nested-loop join:\n" + p.take(3000))
  }

  test("q185 item-CF bounds the per-part rank and joins only on equi keys") {
    val p = plan(graft.queries.MiscQueries.q185ItemCf)
    assert(p.contains("WindowGroupLimit"),
      "top-3 neighbors must prune map-side:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q186 conjunctive BM25 top-10 is TakeOrderedAndProject; no nested loop") {
    val p = plan(graft.queries.TextQueries.q186BooleanBm25)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  // q183's interior (contraction joins, delta CC) sits behind
  // localCheckpoints, so — the q58 convention — assert on the subtree
  // where a cartesian could actually arise: the endpoint-label
  // contraction join, plus the final composed plan.
  test("q183 contraction joins are equi-keyed: no cartesian, no nested loop") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    import graft.operators.Dedup
    val sig = Dedup.minhash(docs, col("doc_id"), Dedup.bigrams(col("text")), 16)
    val edges = Dedup.bucketStarEdges(Dedup.lshBands(sig, 8, 2))
      .filter(col("a") % 10 === 0 || col("b") % 10 === 0)
    val labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    val contracted = edges
      .join(labels.select(col("id").as("a"), col("lbl").as("a_l")), Seq("a"), "left")
      .join(labels.select(col("id").as("b"), col("lbl").as("b_l")), Seq("b"), "left")
      .select(coalesce(col("a_l"), col("a")).as("a"),
        coalesce(col("b_l"), col("b")).as("b"))
    val p1 = contracted.queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct")
      && !p1.contains("BroadcastNestedLoopJoin"), p1.take(3000))
    val p = plan(graft.queries.DedupQueries.q183IncrementalCc)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  // q188's rounds each end in a localCheckpoint, so build one relaxation
  // round the way the query does and pin its shape: an equi join
  // frontier→edges plus a map-side-combined min — never a window, never
  // a nested loop.
  test("q188 relaxation round is one equi join + partial-agg min, no window") {
    import org.apache.spark.sql.functions._
    val pc = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = (lit(1) + col("cnt") % 7).cast("long")
    val ed = pc.select(concat(lit("u:"), col("user_id")).as("esrc"),
        concat(lit("t:"), col("event_type")).as("edst"), w.as("w"))
      .localCheckpoint(true)
    val d = pc.agg(min(col("event_type")).as("t"))
      .select(concat(lit("t:"), col("t")).as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    val round = d.unionByName(
        d.join(ed, d("node") === ed("esrc"))
          .select(col("edst").as("node"), (col("dist") + col("w")).as("dist")))
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "relaxation must not plan a window:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the min must partial-aggregate map-side: two HashAggregate levels
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-node min must map-side combine:\n" + p.take(3000))
  }

  test("q189 lead window is partitioned by user; final join broadcasts the out-degree side") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the lead stage sits behind q189's checkpoint — build it as the
    // query does and pin the partitioning (bounded by a user's history,
    // never a global window)
    val evt = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    val lw = evt.select(col("event_type").as("cur"),
      lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
        .as("nxt"))
    val pw = lw.queryExecution.executedPlan.toString
    assert(pw.contains("windowspecdefinition(user_id"),
      "lead must partition by user_id:\n" + pw.take(3000))
    val p = plan(graft.queries.StreamQueries.q189TransitionMatrix)
    assert(p.contains("BroadcastHashJoin"),
      "|types|-sized out-degree side must broadcast:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q190 weighted percentile path plans no window anywhere") {
    // the whole point of Percentiles' histogram + distributed-prefix-sum
    // path: the pre-barrier phase is RDD mapPartitions by construction
    // (no SQL window can exist there), and the post-barrier join/agg
    // composition must not regress into one either
    val p = plan(graft.queries.AggQueries.q190WeightedPct)
    assert(!p.contains("Window"), "percentile path must stay window-free:\n" + p.take(3000))
    // the p-values cross join is the deliberate bounded 3-row broadcast;
    // a cartesian (both sides shuffled) must never appear
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q180 all five FK anti joins broadcast their parent side") {
    // AQE's initial plan can be conservative — execute, read the final
    val df = graft.queries.MiscQueries.q180FkAudit.run(spark, TestSpark.sf0001)
    df.collect()
    // AQE stringifies BOTH the final and the initial plan — count within
    // the final section only, or every join double-counts
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0)
    val anti = "BroadcastHashJoin [^\\n]*LeftAnti".r.findAllIn(p).size
    assert(anti == 5,
      s"expected 5 broadcast anti joins, saw $anti:\n" + p.take(4000))
    assert(!"SortMergeJoin [^\\n]*LeftAnti".r.findFirstIn(p).isDefined,
      "no FK edge may shuffle its child for an anti probe:\n" + p.take(4000))
  }

  test("q192 correlated scalar subquery decorrelates to ONE aggregate join") {
    // the struct-typed scalar subquery must become a per-part aggregate
    // joined back to the fact — never a per-row subquery, and never TWO
    // aggregate scans (the two-subquery form Catalyst won't merge)
    val df = JoinQueries.q192ScalarSubquery.run(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // 4 HashAggregates: partial+final for the subquery agg, partial+final
    // for the brand rollup — a 6-count means the subqueries didn't merge
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs == 4, s"expected one decorrelated aggregate (4 HashAggregates), saw $aggs:\n" + p.take(3000))
  }

  test("q194 containment join meets on the prefix-token equi key, never a nested loop") {
    val p = plan(graft.queries.DedupQueries.q194ContainmentJoin)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q194b narrow verify never exchanges an array column, never a nested loop") {
    val p = plan(graft.queries.DedupQueries.q194bContainmentNarrow)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the narrow-path contract: no shuffle writes token-array rows — the
    // only array columns (ws/wa/wb) stay inside scan-side projections.
    // Exchange lines list their output schema; an array in one means the
    // verify re-attached payloads to candidate rows.
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toVector
    assert(exchanges.nonEmpty, "expected shuffles in the narrow path:\n" + p.take(2000))
    val arrayExch = exchanges.filter(l => l.contains("wa#") || l.contains("wb#"))
    assert(arrayExch.isEmpty,
      "narrow verify must not shuffle token arrays:\n" + arrayExch.mkString("\n"))
  }

  test("q196 personalized pagerank rounds are equi joins with map-side combined sums") {
    // each round ends in a localCheckpoint — build one round the way the
    // query does (the q188 convention) and pin its shape
    import org.apache.spark.sql.functions._
    val pairs = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .select(col("user_id"), col("event_type")).distinct()
    val edges = pairs
      .select(concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val seed = pairs.agg(min(col("event_type")).as("t"))
      .select(concat(lit("t:"), col("t")).as("node"))
      .localCheckpoint(true)
    val ranks = seed.select(col("node"), lit(1000000L).as("pr"))
    val round = edges
      .join(ranks, col("src") === col("node"))
      .join(deg, "src")
      .select(col("dst"), expr("pr div d").as("contrib"))
      .groupBy(col("dst"))
      .agg(expr("(85 * sum(contrib)) div 100").as("pr"))
      .select(col("dst").as("node"), col("pr"))
      .unionByName(seed.select(col("node"), lit(150000L).as("pr")))
      .groupBy(col("node")).agg(sum(col("pr")).as("pr"))
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-node sum must map-side combine:\n" + p.take(3000))
  }

  test("q197 cell balance argmin prunes map-side; only the bounded centroid cross join") {
    // the corpus x centroids crossJoin IS the assignment pass — a
    // broadcast of sqrt(N) rows, deliberate; a CartesianProduct (both
    // sides shuffled) must never appear
    val p = plan(graft.queries.SimilarityQueries.q197CellBalance)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val assign = Similarity.cellAssign(
      emb.select(col("vec_id").as("xid"), col("embedding").as("xvec")),
      emb.filter(col("vec_id") < 23)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec")))
    val pa = assign.queryExecution.executedPlan.toString
    // round 20: the argmin is a min(struct(d2, cid)) AGGREGATION — the
    // partial_min below the exchange is the map-side prune (one row per
    // vector crosses the wire), replacing the former WindowGroupLimit
    // sort-window shape
    assert(pa.contains("partial_min(struct(d2"),
      "nearest-cell argmin must prune map-side:\n" + pa.take(3000))
    assert(!pa.contains("Window"),
      "the argmin must be an aggregation, not a sort window:\n" + pa.take(3000))
  }

  test("q198 lsh decontamination meets on band buckets: no cartesian, no nested loop") {
    val p = plan(graft.queries.DedupQueries.q198LshDecontaminate)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      "eval and corpus must meet on (band, key), never all-pairs:\n" + p.take(3000))
  }

  test("q199 join-size audit aggregates histograms map-side and joins equi-keyed") {
    val p = plan(graft.queries.MiscQueries.q199JoinSizeAudit)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "key histograms must map-side combine:\n" + p.take(3000))
  }

  test("q200 accumulating snapshot is one scan, no window, no join") {
    val p = plan(graft.queries.MiscQueries.q200AccumSnapshot)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), "the conditional-min form needs no join:\n" + p.take(3000))
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, saw $scans:\n" + p.take(3000))
  }

  test("q201 drift monitor plans no window; only the 1-row midpoint broadcast crosses") {
    val p = plan(graft.queries.AggQueries.q201DistributionDrift)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q202 scd2 build is one key-partitioned lead window, no join") {
    val p = plan(JoinQueries.q202Scd2Build)
    assert(p.contains("windowspecdefinition(c_custkey"),
      "effective/expiry ranges must come from one per-key window:\n" + p.take(3000))
    assert(!p.contains("Join"), "the build needs no join:\n" + p.take(3000))
  }

  test("q203/q204 percentile compositions stay window-free past the gap/user stage") {
    // the ONLY window either query owns is the per-user lead deriving
    // gaps (q203) — the percentile machinery itself must plan no window
    // and no cartesian in the post-checkpoint composition
    val p3 = plan(graft.queries.AggQueries.q203DwellTimePct)
    assert(!p3.contains("Window"), p3.take(3000))
    assert(!p3.contains("CartesianProduct"), p3.take(3000))
    val p4 = plan(graft.queries.MiscQueries.q204RfmScores)
    assert(!p4.contains("Window"),
      "RFM scoring must not fall back to a global ntile window:\n" + p4.take(3000))
    assert(!p4.contains("CartesianProduct"), p4.take(3000))
  }

  test("q205 matrix product is an equi join on the middle state with map-side sums") {
    val p = plan(graft.queries.StreamQueries.q205Markov2Step)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "P² cells must map-side combine:\n" + p.take(3000))
  }

  test("q206 association rules join equi-keyed; the 1-row total broadcasts") {
    val p = plan(graft.queries.MiscQueries.q206AssocRules)
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q207 exact-k sample rank prunes map-side (WindowGroupLimit)") {
    val p = plan(graft.queries.TextQueries.q207ExactKSample)
    assert(p.contains("WindowGroupLimit"),
      "per-stratum k must prune losers map-side:\n" + p.take(3000))
  }

  test("q208 pareto classification plans no global window") {
    // the cumulative revenue comes from the distributed prefix sum —
    // a single-partition running-sum window over the catalog is exactly
    // what this query exists to avoid
    val p = plan(graft.queries.AggQueries.q208ParetoAbc)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q209 degree distribution is two agg levels over the candidate list") {
    val p = plan(graft.queries.DedupQueries.q209DegreeDist)
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "degree counts must map-side combine:\n" + p.take(3000))
  }

  test("q210 regression trend is two agg levels, no window, no solver loop") {
    val p = plan(graft.queries.AggQueries.q210RegrTrend)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "sufficient statistics must map-side combine:\n" + p.take(3000))
  }

  test("q211 equi-depth binning plans no global window") {
    // the global rank comes from the distributed prefix sum; a
    // single-partition ntile window is exactly what this query avoids
    val p = plan(graft.queries.SortQueries.q211EquidepthBins)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q212 streak windows stay user-partitioned") {
    val p = plan(graft.queries.MiscQueries.q212Streaks)
    // the one window must carry the user_id partition spec — a global
    // (unpartitioned) row_number would single-task the whole grid
    assert("Window.*user_id".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q213 priority sample is a bounded top-k, no window, no global sort") {
    val p = plan(graft.queries.TextQueries.q213PrioritySample)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q214 feature hashing is joinless map-side-combined aggregation") {
    val p = plan(graft.queries.TextQueries.q214FeatureHash)
    assert(!p.contains("Join"), "no join belongs in the hashing trick:\n" + p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q215 kneser-ney joins equi-keyed; the 1-row total broadcasts") {
    val p = plan(graft.queries.TextQueries.q215KneserNey)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "bigram counts must map-side combine:\n" + p.take(3000))
  }

  test("q216 min-max scaling broadcasts the group stats, no window") {
    val p = plan(graft.queries.AggQueries.q216MinmaxScale)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "the type-bounded stats side must broadcast, not shuffle the facts:\n" + p.take(3000))
  }

  test("q217 cusum prefix windows stay type-partitioned; stats broadcast") {
    val p = plan(graft.queries.StreamQueries.q217CusumChangepoint)
    assert("Window.*et#".r.findFirstIn(p).isDefined,
      "the prefix sum must carry the per-type partition spec:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q218 negative sampling subtracts positives via one anti hash join") {
    val p = plan(graft.queries.MiscQueries.q218NegativeSample)
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q219 twap lead window stays user-partitioned") {
    val p = plan(graft.queries.StreamQueries.q219Twap)
    assert("Window.*user_id".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q220 rendezvous argmax is a windowless map-side-combined aggregation") {
    val p = plan(graft.queries.MiscQueries.q220RendezvousShards)
    assert(!p.contains("Window"),
      "the per-key argmax must fold as max(struct), not a window:\n" + p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q221 rolling corr is a broadcast band join over the day grid, no window") {
    val p = plan(graft.queries.AggQueries.q221RollingCorr)
    assert(!p.contains("Window"),
      "the calendar frame must be the band join, not a global window:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "daily counts must map-side combine before the band join:\n" + p.take(3000))
  }

  test("q222 skyline plans the prefix-max path, never a window or n² join") {
    val p = plan(graft.queries.SortQueries.q222Skyline)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the dominance test must be the runningMax equi-join, not the quadratic join:\n" +
        p.take(3000))
  }

  test("q223 hour bitmap is a joinless windowless bitwise aggregation") {
    val p = plan(graft.queries.MiscQueries.q223HourBitmap)
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the OR must partial-aggregate map-side:\n" + p.take(3000))
  }

  test("q224 hll overlap builds registers once, map-side combined") {
    val p = plan(graft.queries.AggQueries.q224HllOverlap)
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "register build must map-side combine:\n" + p.take(3000))
  }

  test("q225 interval union windows stay user-partitioned") {
    val p = plan(graft.queries.StreamQueries.q225IntervalUnion)
    assert("Window.*user_id".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q226 minhash calibration joins equi-keyed at candidate scale") {
    val p = plan(graft.queries.DedupQueries.q226MinhashCalibration)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "every join must be equi-keyed (candidate pairs, shingles, sizes):\n" + p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q227 chi-square margins broadcast back onto the cell table") {
    val p = plan(graft.queries.AggQueries.q227ChisqIndependence)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q228 assortativity is equi joins over the degree table, no window") {
    val p = plan(graft.queries.DedupQueries.q228Assortativity)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q229 decayed count is shift arithmetic + one map-side-combined agg") {
    val p = plan(graft.queries.MiscQueries.q229DecayedCount)
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q230 wow growth lag window stays priority-partitioned") {
    val p = plan(graft.queries.MiscQueries.q230WowGrowth)
    assert("Window.*pri".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "weekly revenue must map-side combine before the lag:\n" + p.take(3000))
  }

  test("q231 HOF doc stats plan exactly one scan and ZERO exchanges") {
    // the entire point: per-doc token stats without explode — the token
    // array never leaves its row, so nothing shuffles
    val p = plan(graft.queries.TextQueries.q231HofDocstats)
    assert(!p.contains("Exchange"), "HOF stats must not shuffle:\n" + p.take(3000))
    assert(!p.contains("Generate"), "HOF stats must not explode:\n" + p.take(3000))
  }

  test("q232 bounce rate windows stay user-partitioned") {
    val p = plan(graft.queries.StreamQueries.q232BounceRate)
    assert("Window.*user_id".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q233 growth accounting self-joins the grid equi-keyed") {
    val p = plan(graft.queries.MiscQueries.q233GrowthAccounting)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q234 benford is one agg to nine rows; no window, no log evaluated") {
    val p = plan(graft.queries.AggQueries.q234Benford)
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.toLowerCase.contains("log10"),
      "the Benford expectation must stay a constant table:\n" + p.take(3000))
  }

  test("q235 date spine generates the grid; no cartesian beyond the bounded cross") {
    val p = plan(graft.queries.MiscQueries.q235DateSpine)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q236 source similarity dot product joins equi-keyed on the term") {
    val p = plan(graft.queries.TextQueries.q236SourceSimilarity)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q237 blocking quality: truth from one md5 group join, never all-pairs") {
    val p = plan(graft.queries.DedupQueries.q237BlockingQuality)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q238 reconciliation aggregates lines before the header join") {
    val p = plan(graft.queries.MiscQueries.q238Reconciliation)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "line totals must map-side combine:\n" + p.take(3000))
  }

  test("q239 ltv triangle cumulative window stays cohort-partitioned") {
    val p = plan(graft.queries.MiscQueries.q239LtvTriangle)
    assert("Window.*cohort".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q240 simpson diversity is two agg levels, no window, no log evaluated") {
    val p = plan(graft.queries.TextQueries.q240SimpsonDiversity)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.toLowerCase.contains("log("),
      "diversity must stay rational — no entropy log:\n" + p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q241 dedup savings is one hash group + one hash-keyed join back") {
    val p = plan(graft.queries.DedupQueries.q241DedupSavings)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q242 peak detection windows stay type-partitioned") {
    val p = plan(graft.queries.StreamQueries.q242PeakDays)
    assert("Window.*et#".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "daily counts must map-side combine before the lag/lead:\n" + p.take(3000))
  }

  test("q243 burstiness gap window stays user-partitioned") {
    val p = plan(graft.queries.StreamQueries.q243Burstiness)
    assert("Window.*user_id".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q244 vocab concentration bounds the top-k below its windows") {
    // the cumulative-mass windows are unpartitioned by design — they must
    // sit ABOVE a TakeOrderedAndProject so only the bounded top-k funnels in
    val p = plan(graft.queries.TextQueries.q244VocabConcentration)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q245 new-vs-repeat joins the first-month table equi-keyed") {
    val p = plan(graft.queries.MiscQueries.q245NewVsRepeat)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q246 diurnal distance: only the histogram build touches event scale") {
    val p = plan(graft.queries.StreamQueries.q246DiurnalDistance)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the hour histogram must map-side combine:\n" + p.take(3000))
  }

  test("q247 hhi concentration is two map-side-combined agg levels, no window") {
    val p = plan(graft.queries.AggQueries.q247HhiConcentration)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), "HHI needs no join at all:\n" + p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q248 dormancy buckets collapse to user grain before any join") {
    val p = plan(graft.queries.MiscQueries.q248DormancyBuckets)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q13 large-large join degrades to a shuffle join when neither side broadcasts") {
    // at test scale orders fits under the broadcast threshold; disable it to
    // assert the large-large physical strategy Catalyst picks at 100 TB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(JoinQueries.q13JoinTagged)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
