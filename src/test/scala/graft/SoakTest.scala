package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** On-demand scale soak (ignored in the regular suite — flip `ignore` to
  * `test` to run): replicate sf0.1 10× into /tmp and run the heaviest
  * operators. Last run (local[4], 16g, 16-seed/8-band minhash via the
  * one-digest-per-group Md5Words path): q51 22.0s (11.7M pairs — the
  * replication creates genuine duplicate groups, C(10,2) per text, so the
  * pair count is data-driven, not a cliff; was 26.8s with per-member
  * digests and 10.7s / 4.7M pairs at the old 8/4 config), q57 24.1s (96k
  * pairs; bucket sizes grow linearly with corpus at fixed plane count —
  * raise `Planes` ∝ log2(corpus) at real scale), q60 1.6s, q30 1.5s over
  * 10M events, q52 0.8s. Round-4 rerun: q51 19.1s, q58 components over
  * all 50k docs 11.5s (bucket-star edges keep it sublinear in the 11.7M
  * pair volume; 1.6× the sf0.1 time at 10× the data), q57 14.8s, q60
  * 1.2s, q30 1.2s, q52 0.5s. Round-5 rerun (window-min star edges +
  * delta-frontier CC, one job per round): q51 15.4s, q58 9.0s (~1.8× the
  * sf0.1 time at 10× the data — the frontier empties after the clique
  * hubs merge, so extra rounds cost frontier-sized, not corpus-sized,
  * work), q57 17.1s, q60 1.0s, q30 1.4s, q52 0.5s.
  */
class SoakTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  ignore("10x soak: dedup + ANN + sort at ~50k docs / 50k vectors / 10M events") {
    val base = "/root/testdata/sf0.1"
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-soak"
    val n = 10
    // documents ×10 with remapped ids
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until n).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until n).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    (0 until n).map(i => ev.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SOAK $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1fs  rows=$rows")
    }
    time("q51_minhash_lsh") {
      graft.queries.DedupQueries.q51MinhashLsh.run(spark, dir).count()
    }
    time("q58_dedup_groups") {
      graft.queries.DedupQueries.q58DedupGroups.run(spark, dir).count()
    }
    time("q57_embed_dedup") {
      graft.queries.DedupQueries.q57EmbedDedup.run(spark, dir).count()
    }
    time("q60_ann_cosine") {
      graft.queries.SimilarityQueries.q60AnnCosine.run(spark, dir).count()
    }
    time("q30_sort_validate") {
      graft.queries.SortQueries.q30SortValidate.run(spark, dir).count()
    }
    time("q52_simhash") {
      graft.queries.DedupQueries.q52Simhash.run(spark, dir).count()
    }
  }
}
