package graft.operators

import graft.functions.Bpe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary LEARNING — the greedy merge-induction loop of
  * Sennrich et al., "Neural Machine Translation of Rare Words with Subword
  * Units" (ACL 2016) §3.2, run Spark-first. ([[Bpe]] is the APPLY side; the
  * reference repo has no tokenizer-training counterpart — this is
  * builder-brief training-pipeline scope.)
  *
  * Scale shape: the corpus collapses to a (word, count) VOCAB once — one
  * shuffle over corpus tokens, after which nothing is corpus-sized. Each
  * merge iteration re-tokenizes the vocab map-side (the current merge table
  * rides the closure; a production-sized one would broadcast the same way),
  * aggregates weighted adjacent-pair counts (one vocab-sized shuffle), and
  * takes the argmax as a distributed top-1 (TakeOrderedAndProject — never a
  * driver-side sort). The driver holds only the learned merge table. At
  * 100 TB the per-iteration cost is bounded by |vocab|, not |corpus|.
  */
object BpeTrain {

  /** Corpus text column -> (w, c) vocab of lowercase letter runs (the same
    * BPE-able units as q72b's apply side).
    */
  def vocab(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text").cast("string")).as[String]
      .flatMap(Bpe.letterRuns)
      .toDF("w").groupBy(col("w")).agg(count(lit(1)).as("c"))
  }

  /** Weighted adjacent-symbol-pair counts for a (w, c) vocab under a merge
    * table: tokenize each word with the real apply loop, emit its adjacent
    * pairs weighted by the word's corpus count, aggregate. Single-symbol
    * words contribute nothing (no adjacent pair exists).
    */
  def pairCounts(words: DataFrame, ranks: Map[(String, String), Int]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("w").cast("string"), col("c").cast("long")).as[(String, Long)]
      .flatMap { case (w, c) =>
        val syms = Bpe.tokenize(w, ranks)
        (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
      }
      .toDF("a", "b", "c")
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("cnt"))
  }

  /** One greedy learning step: the adjacent pair with the highest weighted
    * count under the current table (ties (a, b) ascending so reruns are
    * bit-deterministic) and its count, or None when no adjacent pair
    * remains. The argmax is a distributed top-1 (TakeOrderedAndProject);
    * only the single winning row reaches the driver.
    */
  def learnStep(words: DataFrame,
      merges: Vector[(String, String)]): Option[(String, String, Long)] = {
    val top = pairCounts(words, merges.zipWithIndex.toMap)
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(1).collect()
    top.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Learn `n` merges greedily on top of `init`: each round adopts the pair
    * with the highest weighted count, ties broken (a, b) ascending so
    * reruns are bit-deterministic. Stops early if no adjacent pair remains.
    * The result is well-formed by construction (every merge's inputs exist
    * when it is learned), so [[Bpe.tokenize]] under the learned table is
    * equivalent to rank-order replay — the invariant BpeSpec asserts.
    */
  def trainMerges(words: DataFrame, n: Int,
      init: Vector[(String, String)] = Vector.empty): Vector[(String, String)] = {
    var merges = init
    var exhausted = false
    while (merges.size < init.size + n && !exhausted) {
      learnStep(words, merges) match {
        case Some((a, b, _)) => merges :+= ((a, b))
        case None => exhausted = true
      }
    }
    merges
  }
}
