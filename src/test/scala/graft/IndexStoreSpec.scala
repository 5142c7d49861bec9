package graft

import graft.operators.Similarity
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-atomicity of the persisted index stores
  * ([[graft.core.IndexStore]]): a save that dies between table writes
  * must be INVISIBLE — the loader keeps serving the previous committed
  * version bit-exactly — and a subsequent successful save must supersede
  * both. This is the failure the versioned layout exists for: the old
  * flat layout's `mode("overwrite")` sequence could leave new centroids
  * beside old codes with nothing to detect the skew.
  */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sameFrame(a: org.apache.spark.sql.DataFrame,
                        b: org.apache.spark.sql.DataFrame,
                        what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what diverged from the committed version")

  /** A column that throws on evaluation — simulates the executor dying
    * mid-save, AFTER some tables of the new version are already on disk.
    */
  private def poisoned(c: String) =
    expr(s"if($c is not null, cast(raise_error('torn save') as long), $c)")

  test("knn store: a save crashing between tables keeps serving the prior version") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 10 =!= 9)
      .select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val nb = base.count()
    val cells = Similarity.ivfCellsFor(nb)
    val cents = base.orderBy(col("xid")).limit(cells)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))
    val idx = Similarity.knnGraphBuild(base, cents,
      Similarity.ivfProbesFor(cells), 3,
      Similarity.knnCellCapFor(nb, cells, 3))
    val path = graft.core.Graft.scratch("spec_store_knn")

    Similarity.knnIndexSave(idx, path) // v1, committed
    val v1 = Similarity.knnIndexLoad(spark, path).directed.localCheckpoint(true)

    // a second save whose PROBES table (6th of 7) throws mid-write: the
    // earlier tables of the new version are already on disk when it dies
    val poisonedIdx = idx.copy(
      probes = idx.probes.withColumn("cid", poisoned("cid")),
      directed = idx.directed.limit(0)) // would also corrupt, if reached
    intercept[Exception] { Similarity.knnIndexSave(poisonedIdx, path) }

    // the torn version is invisible: load resolves v1 and serves it bit-exact
    val after = Similarity.knnIndexLoad(spark, path)
    sameFrame(after.directed, v1, "directed top-k after torn save")
    assert(graft.core.IndexStore.latest(spark, path).get.version === 1L)

    // a subsequent successful save supersedes v1 (and the torn dir)
    Similarity.knnIndexSave(idx, path, lastBatch = 7L)
    val c = graft.core.IndexStore.latest(spark, path).get
    assert(c.version > 1L, "recovered save must commit a fresh version")
    assert(c.lastBatch === 7L, "replay cursor must survive the commit")
    sameFrame(Similarity.knnIndexLoad(spark, path).directed, v1,
      "directed top-k after recovered save")
  }

  test("rag store: a save crashing between tables keeps serving the prior version") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idx = TextQueries.ragIndexBuildOf(docs)
    val path = graft.core.Graft.scratch("spec_store_rag")

    TextQueries.ragIndexSave(idx, path) // v1, committed
    val v1 = TextQueries.ragIndexLoad(spark, path)
    val v1Postings = v1.postings.drop("tb").localCheckpoint(true)

    // poison the CODES table (written last): every sparse table of the
    // torn version is fully on disk when the save dies
    val poisonedIdx = idx.copy(
      index = idx.index.withColumn("cid", poisoned("cid")))
    intercept[Exception] { TextQueries.ragIndexSave(poisonedIdx, path) }

    val after = TextQueries.ragIndexLoad(spark, path)
    sameFrame(after.postings.drop("tb"), v1Postings,
      "postings after torn save")
    assert(after.corpusCount === v1.corpusCount)
    assert(graft.core.IndexStore.latest(spark, path).get.version === 1L)

    TextQueries.ragIndexSave(idx, path, lastBatch = 3L)
    val c = graft.core.IndexStore.latest(spark, path).get
    assert(c.version > 1L && c.lastBatch === 3L)
    sameFrame(TextQueries.ragIndexLoad(spark, path).postings.drop("tb"),
      v1Postings, "postings after recovered save")
  }

  test("store with no committed version refuses to load") {
    val path = graft.core.Graft.scratch("spec_store_empty")
    val e = intercept[RuntimeException] {
      graft.core.IndexStore.latestDir(spark, path)
    }
    assert(e.getMessage.contains("no committed index version"))
  }
}
