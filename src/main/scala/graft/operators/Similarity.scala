package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and sign-random-projection LSH bucketing as the 100 TB path
  * (candidates restricted to matching hash buckets before exact scoring).
  *
  * Cross-engine exactness: dot products accumulate in DECIMAL — each float
  * element is cast to DECIMAL(12,7) (deterministic decimal rounding of the
  * exact binary value; no float ever lands on a half-ulp decimal boundary,
  * so both engines round identically), products and sums are exact, and
  * the final cosine is one fixed tree of double ops — bit-identical in
  * Spark and DuckDB. All vector math is codegen'd builtins
  * (`zip_with`/`aggregate`), no UDFs.
  */
object Similarity {

  private val D = DecimalType(12, 7)

  // accumulator precision stays under Spark's 38 cap so each addition is
  // exact at scale 14 and the cast back never rounds (|sums| << 10^18)
  private val Acc = DecimalType(32, 14)

  /** Exact decimal dot product of two float-array columns. Floats widen to
    * double BEFORE the decimal cast: Spark's float→decimal goes through the
    * float's shortest 9-digit string, which can flip the 7th decimal versus
    * the exact binary value DuckDB rounds — the double path is exact in
    * both engines.
    */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double").cast(D) * y.cast("double").cast(D)),
      lit(0).cast(Acc),
      (acc, v) => (acc + v).cast(Acc))

  /** Cosine similarity, computed as double from exact decimal moments. */
  def cosine(a: Column, b: Column): Column =
    dotDecimal(a, b).cast("double") /
      (sqrt(dotDecimal(a, a).cast("double")) * sqrt(dotDecimal(b, b).cast("double")))

  /** Brute-force top-k: broadcast the (small) query set against all
    * candidates, rank per query with a partitioned window (bounded per
    * group — scale-safe).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // queries: (qid, qvec); corpus: (xid, xvec). Norms are computed ONCE
    // per vector (not per pair) — at N queries × M corpus rows that turns
    // 3·N·M dot products into N·M + N + M.
    val qn = queries.withColumn("qnorm", sqrt(dotDecimal(col("qvec"), col("qvec")).cast("double")))
    val xn = corpus.withColumn("xnorm", sqrt(dotDecimal(col("xvec"), col("xvec")).cast("double")))
    val scored = xn.crossJoin(broadcast(qn))
      .select(col("qid"), col("xid"),
        (dotDecimal(col("qvec"), col("xvec")).cast("double") /
          (col("qnorm") * col("xnorm"))).as("cos"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("xid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("xid"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Sign-random-projection bucket id: bit j = 1 iff Σ_d vec[d]·sign[j][d] > 0.
    * `signs(j)(d)` ∈ {-1, 1} is a deterministic hyperplane matrix shared
    * (as literals) with the oracle.
    */
  def srpBucket(vec: Column, signs: Seq[Seq[Int]]): Column = {
    val bits = signs.zipWithIndex.map { case (row, j) =>
      val signArr = typedlit(row)
      val dot = aggregate(
        zip_with(vec, signArr, (x, s) => x.cast("double").cast(D) * s.cast(D)),
        lit(0).cast(Acc),
        (acc, v) => (acc + v).cast(Acc))
      when(dot > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: assign every corpus vector to its nearest
    * coarse centroid (the cell), probe only the query's `nProbe` nearest
    * cells, score candidates exactly. At 100 TB the corpus is partitioned
    * by cell id, so a query touches nProbe/nCells of the data — the
    * classic coarse-quantizer trade. Centroids come from the caller
    * (production: offline k-means; here a deterministic sample).
    * Distances compare as d² = |x|² − 2x·c + |c|² from exact decimal
    * moments, so assignments are engine-identical.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // distance of every corpus vector to every centroid (small C)
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col("xid"), col("xvec"), col("cid"),
        (dotDecimal(col("xvec"), col("xvec")).cast("double") -
          lit(2) * dotDecimal(col("xvec"), col("cvec")).cast("double") +
          dotDecimal(col("cvec"), col("cvec")).cast("double")).as("d2"))
    val byDist = Window.partitionBy(col("xid")).orderBy(col("d2"), col("cid"))
    val ranked = scored.withColumn("rn", row_number().over(byDist))
    val assign = ranked.filter(col("rn") === 1).select(col("xid"), col("cid"))
    val probes = ranked.alias("r")
      .join(broadcast(queries.select(col("qid"))), col("r.xid") === col("qid"))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cid"))
    val cand = probes.alias("p")
      .join(assign.alias("a"), col("p.cid") === col("a.cid"))
      .select(col("p.qid").as("qid"), col("a.xid").as("xid"))
    val qn = queries.withColumn("qnorm",
      sqrt(dotDecimal(col("qvec"), col("qvec")).cast("double")))
    val xn = corpus.withColumn("xnorm",
      sqrt(dotDecimal(col("xvec"), col("xvec")).cast("double")))
    val exact = cand
      .join(broadcast(qn), "qid")
      .join(xn, "xid")
      .select(col("qid"), col("xid"),
        (dotDecimal(col("qvec"), col("xvec")).cast("double") /
          (col("qnorm") * col("xnorm"))).as("cos"))
    exact
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("xid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("xid"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic ±1 hyperplane matrix: sign(j,d) from the parity of the
    * portable MD5-derived hash of "j:d" — reproducible anywhere.
    */
  def srpSigns(nPlanes: Int, dims: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until dims).map { d =>
        val h = md.digest(s"$j:$d".getBytes("UTF-8"))
        if ((h(15) & 1) == 1) 1 else -1
      }
    }
  }

  /** LSH-bucketed ANN: score only candidates whose bucket matches the
    * query's bucket, then exact cosine + per-query rank. At 100 TB the
    * bucket id is the join key — the corpus is hash-partitioned by bucket
    * and only matching buckets are scanned.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      signs: Seq[Seq[Int]], k: Int): DataFrame = {
    val qb = queries.select(col("qid"), col("qvec"),
      srpBucket(col("qvec"), signs).as("bucket"),
      sqrt(dotDecimal(col("qvec"), col("qvec")).cast("double")).as("qnorm"))
    val xb = corpus.select(col("xid"), col("xvec"),
      srpBucket(col("xvec"), signs).as("xbucket"),
      sqrt(dotDecimal(col("xvec"), col("xvec")).cast("double")).as("xnorm"))
    val scored = xb.join(broadcast(qb), col("bucket") === col("xbucket"))
      .select(col("qid"), col("xid"),
        (dotDecimal(col("qvec"), col("xvec")).cast("double") /
          (col("qnorm") * col("xnorm"))).as("cos"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("xid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("xid"), col("cos"), col("rank").cast("long").as("rank"))
  }
}
