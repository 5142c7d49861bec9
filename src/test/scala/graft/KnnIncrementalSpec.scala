package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q167d serve ≡ rebuild contract, asserted in-engine (the oracle hash
  * proves it against DuckDB; this spec proves it against the ENGINE's own
  * full rebuild under the frozen config, two-way, and pins the splice
  * property the serve's cost model depends on): a delta append served
  * against [[Similarity.knnGraphBuild]] artifacts must equal the graph a
  * wholesale rebuild under the identical frozen config (centroids,
  * quantizer, cap, probes) produces — and every UNAFFECTED query's
  * directed rows must come from the build artifact verbatim, because
  * that is what makes serve O(delta) instead of O(N).
  */
class KnnIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 3

  test("serve over build artifacts equals the frozen-config full rebuild (two-way)") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 100 =!= 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val delta = emb.filter(col("vec_id") % 100 === 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val nb = base.count()
    val cells = Similarity.ivfCellsFor(nb)
    val nProbe = Similarity.ivfProbesFor(cells)
    val cap = Similarity.knnCellCapFor(nb, cells, K)
    val centroids = base.orderBy(col("xid")).limit(cells)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))

    val idx = Similarity.knnGraphBuild(base, centroids, nProbe, K, cap)
    val served = Similarity.knnGraphServe(idx, delta).localCheckpoint(true)

    // the full rebuild under the SAME frozen config, assembled from the
    // same primitives the operator uses — frozen quantizer included (a
    // plain knnGraphBuild over base ∪ delta would retrain the stats)
    val all = base.unionByName(delta)
    val full = {
      import org.apache.spark.sql.expressions.Window
      val ranked = Similarity.cellRanked(all, idx.centroids, nProbe)
      val servable = ranked.filter(col("rn") === 1)
        .select(col("xid").as("nid"), col("cid"), col("d2"))
        .withColumn("crn", row_number().over(
          Window.partitionBy(col("cid")).orderBy(col("d2"), col("nid"))))
        .filter(col("crn") <= cap)
        .select(col("nid"), col("cid"))
      val probes = ranked.select(col("xid").as("qid"), col("cid"))
      val enc = Similarity.sq8EncodeFrozen(all, idx.stats)
      val xn = all.select(col("xid"), Similarity.scaled(col("xvec")).as("xs"))
        .withColumn("norm",
          sqrt(Similarity.dotScaled(col("xs"), col("xs")).cast("double")))
      val directed = Similarity.scoreDirected(probes, servable, enc, xn, K)
        .localCheckpoint(true)
      directed.alias("f")
        .join(directed.alias("r"),
          col("f.qid") === col("r.nid") && col("f.nid") === col("r.qid"))
        .filter(col("f.qid") < col("f.nid"))
        .select(col("f.qid").as("a"), col("f.nid").as("b"),
          col("f.cos").as("cos"))
        .localCheckpoint(true)
    }

    assert(served.count() > 0, "fixture must produce a non-empty graph")
    assert(served.exceptAll(full).isEmpty, "serve rows missing from rebuild")
    assert(full.exceptAll(served).isEmpty, "rebuild rows missing from serve")

    // the fixture must actually exercise the incremental machinery:
    // some cell is touched, and some base query is NOT affected (else
    // the splice path — the whole point of serve — went untested)
    val dAssign = Similarity.cellRanked(delta, idx.centroids, 1)
      .filter(col("rn") === 1).select(col("cid")).distinct()
    val touched = dAssign.count()
    assert(touched > 0, "delta must land in at least one cell")
    val affectedQ = idx.probes.join(dAssign, "cid").select(col("qid")).distinct().count()
    assert(affectedQ < nb,
      s"every base query affected ($affectedQ of $nb) — splice path untested")
  }

  test("unaffected queries' directed rows splice in from the artifact verbatim") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 100 =!= 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val delta = emb.filter(col("vec_id") % 100 === 99)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val nb = base.count()
    val cells = Similarity.ivfCellsFor(nb)
    val nProbe = Similarity.ivfProbesFor(cells)
    val centroids = base.orderBy(col("xid")).limit(cells)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))
    val idx = Similarity.knnGraphBuild(base, centroids, nProbe, K,
      Similarity.knnCellCapFor(nb, cells, K))

    // recompute the serve's own affected set, then check: for every
    // unaffected base query, the served graph's directed evidence (its
    // a<b mutual edges) is a subset of edges derivable from the ARTIFACT
    // directed list — i.e. serve never rescored it
    val touched = Similarity.cellRanked(delta, idx.centroids, 1)
      .filter(col("rn") === 1).select(col("cid")).distinct()
    val affected = idx.probes.join(touched, "cid").select(col("qid")).distinct()
    val served = Similarity.knnGraphServe(idx, delta)
    // edges between two unaffected endpoints must exist in the artifact's
    // mutual closure exactly
    val artMutual = idx.directed.alias("f")
      .join(idx.directed.alias("r"),
        col("f.qid") === col("r.nid") && col("f.nid") === col("r.qid"))
      .filter(col("f.qid") < col("f.nid"))
      .select(col("f.qid").as("a"), col("f.nid").as("b"), col("f.cos").as("cos"))
    val unafServed = served
      .join(affected.select(col("qid").as("a")), Seq("a"), "left_anti")
      .join(affected.select(col("qid").as("b")), Seq("b"), "left_anti")
      .select(col("a"), col("b"), col("cos"))
    val unafArt = artMutual
      .join(affected.select(col("qid").as("a")), Seq("a"), "left_anti")
      .join(affected.select(col("qid").as("b")), Seq("b"), "left_anti")
      .select(col("a"), col("b"), col("cos"))
    assert(unafServed.exceptAll(unafArt).isEmpty
      && unafArt.exceptAll(unafServed).isEmpty,
      "unaffected-pair edges must match the artifact's mutual closure")
  }
}
