package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 corpus-construction operators — q115
  * paragraph dedup, q116 SemDeDup, q117 ORC interchange, q118 sliding
  * chunking — beyond what the value-equality oracles pin: the defining
  * GUARANTEE each operator makes (no kept near-pair survives, reassembly
  * is the identity, chunks tile the token stream) rather than one
  * fixture's values.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("dedupCellsFor: balanced assignment-vs-pair sizing, clamped") {
    assert(Similarity.dedupCellsFor(500L) === 16)
    assert(Similarity.dedupCellsFor(1L) === 4) // floor clamp
    assert(Similarity.dedupCellsFor(Long.MaxValue / 2) === (1 << 20)) // cap
    // the law itself: k = ceil(√(N/2)) — assignment N·k and pair N²/2k
    // cost the same there
    assert(Similarity.dedupCellsFor(1000000L) === 708)
  }

  test("semanticDedup: no two KEPT vectors in a cluster at/above threshold; every drop has a witness pair") {
    val t = 0.4
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val centroids = emb.filter(col("vec_id") < Similarity.dedupCellsFor(emb.count()))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val out = Similarity.semanticDedup(corpus, centroids, t)

    val vecs = emb.select(col("vec_id"), col("embedding"))
    val pairs = out.alias("o1").join(out.alias("o2"),
        col("o1.cid") === col("o2.cid") && col("o1.vec_id") < col("o2.vec_id"))
      .join(vecs.select(col("vec_id").as("v1"), col("embedding").as("e1")),
        col("o1.vec_id") === col("v1"))
      .join(vecs.select(col("vec_id").as("v2"), col("embedding").as("e2")),
        col("o2.vec_id") === col("v2"))
      .select(col("o1.vec_id").as("x1"), col("o2.vec_id").as("x2"),
        col("o1.keep").as("k1"), col("o2.keep").as("k2"),
        Similarity.cosine(col("e1"), col("e2")).as("cos"))
    // the defining guarantee: the kept set contains no within-cluster
    // near-pair — SemDeDup's whole point
    assert(pairs.filter(col("k1") && col("k2") && col("cos") >= t).count() === 0L)
    // and nothing was dropped without cause: every dropped vector is one
    // endpoint of SOME at/above-threshold within-cluster pair
    val withCause = pairs.filter(col("cos") >= t)
      .select(explode(array(col("x1"), col("x2"))).as("vec_id")).distinct()
    val uncaused = out.filter(!col("keep"))
      .join(withCause, Seq("vec_id"), "left_anti").count()
    assert(uncaused === 0L)
    // fixture sanity: the drop path actually ran
    assert(out.filter(!col("keep")).count() > 0)
    graft.operators.Dedup.release(out)
  }

  test("semanticDedup is idempotent: re-running on the kept subset drops nothing") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("xid"), col("embedding").as("xvec"))
    val centroids = emb.filter(col("vec_id") < Similarity.dedupCellsFor(emb.count()))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val first = Similarity.semanticDedup(corpus, centroids, 0.4)
    val kept = corpus.join(first.filter(col("keep")).select(col("vec_id").as("xid")), "xid")
    val second = Similarity.semanticDedup(kept, centroids, 0.4)
    assert(second.filter(!col("keep")).count() === 0L)
    graft.operators.Dedup.release(first)
    graft.operators.Dedup.release(second)
  }

  test("paragraph dedup: reassembly is the identity on fully-retained docs; copies retain nothing") {
    val out = queries.DedupQueries.q115ParagraphDedup.run(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // every +1e6 crawl copy is segment-for-segment a duplicate of its
    // original → retains zero
    val copies = out.filter(col("doc_id") >= 1000000L)
    assert(copies.filter(col("kept_segs") =!= 0L).count() === 0L)
    assert(copies.filter(col("clean_text") =!= "").count() === 0L)
    // a doc that kept every segment must reassemble to its EXACT original
    // text (segment → rejoin is lossless)
    val full = out.filter(col("retained_ppm") === 1000000L)
      .join(docs, "doc_id")
    assert(full.count() > 0)
    assert(full.filter(col("clean_text") =!= col("text")).count() === 0L)
    // global conservation: kept segments across the corpus == distinct
    // segment count (each distinct segment survives exactly once) —
    // segmentation recomputed here independently over the base docs (the
    // crawl copies add no new distinct segments)
    val keptTotal = out.agg(sum(col("kept_segs"))).head().getLong(0)
    val distinctSegs = spark.read.parquet(s"$dir/documents.parquet")
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 20.0) as int) - 1), " +
          "i -> array_join(slice(w, i * 20 + 1, 20), ' '))")).as("seg"))
      .distinct().count()
    assert(keptTotal === distinctSegs)
  }

  test("chunk windows: chunks tile the token stream with the exact stride overlap") {
    val out = queries.TextQueries.q118ChunkWindows.run(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val j = out.join(docs, "doc_id")
    // starts are exactly k*stride, ids dense from 0
    assert(j.filter(col("tok_start") =!= col("chunk_id") * 48).count() === 0L)
    // the last chunk ends exactly at the token count — full coverage, no
    // token beyond the text
    val last = j.groupBy(col("doc_id"), col("n"))
      .agg(max(col("tok_start") + col("n_toks")).as("covered"),
        min(col("tok_start")).as("first"))
    assert(last.filter(col("covered") =!= col("n") || col("first") =!= 0L).count() === 0L)
    // a full chunk's trailing overlap == the next chunk's leading tokens
    val pairs = out.alias("a").join(out.alias("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.chunk_id") + 1 === col("b.chunk_id"))
      .filter(col("a.n_toks") === 64)
      .select(
        expr("array_join(slice(split(a.chunk_text, ' '), 49, 16), ' ')").as("tail"),
        expr("array_join(slice(split(b.chunk_text, ' '), 1, 16), ' ')").as("head"))
    assert(pairs.count() > 0)
    assert(pairs.filter(col("tail") =!= col("head")).count() === 0L)
  }

  test("ORC interchange: key predicates push into the ORC scan") {
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val out = core.Graft.scratch("orcspec")
    src.write.mode("overwrite").orc(out)
    val plan = spark.read.orc(out).filter(col("l_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_orderkey,42)"),
      s"ORC scan did not push the key predicate:\n$plan")
  }
}
