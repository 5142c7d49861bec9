package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probabilistic sketch utilities for corpus-scale profiling: count-min
  * (approximate per-item frequency with (eps, confidence) guarantees) and
  * Bloom membership (no false negatives, bounded false-positive rate).
  * Both build in ONE distributed pass with mergeable per-partition
  * sketches — the driver holds only the fixed-size sketch, never the data.
  *
  * Cross-engine note: sketch internals are seed/implementation-specific,
  * so there is no DuckDB oracle for them — guarantees are spec-verified
  * against exact counts instead (SketchesSpec).
  */
object Sketches {

  /** Count-min sketch of a column: overestimates only, with
    * P[estimate - true <= eps * N] >= confidence. Fixed-size state
    * regardless of cardinality — the 100 TB answer to "how often does
    * each of millions of tokens appear, roughly".
    */
  def countMin(df: DataFrame, column: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(column, eps, confidence, seed)

  /** Bloom filter of a column: zero false negatives, ~fpp false positives
    * at the stated expected cardinality.
    */
  def bloom(df: DataFrame, column: String,
            expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(column, expectedItems, fpp)

  /** Bloom-prefiltered semi-join: keep `big` rows whose key might be in
    * `small`, then (optionally) close the gap with an exact semi-join.
    * The pattern for 100 TB: the filter broadcasts as a few MB and prunes
    * the fact scan BEFORE any shuffle, so the exact join only sees
    * survivors (true matches + ~fpp false positives). The mightContain
    * probe is a scalar udf — acceptable here because it replaces a
    * full-table shuffle, not a codegen'd expression.
    */
  def bloomSemiFilter(big: DataFrame, bigKey: Column,
                      small: DataFrame, smallKey: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val bf = bloom(small, smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    // probe with the SAME byte representation the filter inserted:
    // stat.bloomFilter puts longs for integral columns and UTF8 bytes for
    // strings — probing a string key through the long path would miss
    // every true member (and the boxed types keep NULL keys from reading
    // as 0 in a primitive-typed udf)
    small.schema(smallKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        big.filter(might(bigKey.cast("long")))
      case StringType =>
        val might = udf((k: String) => k != null && bc.value.mightContainString(k))
        big.filter(might(bigKey.cast("string")))
      case other =>
        throw new IllegalArgumentException(
          s"bloomSemiFilter: unsupported key type $other (integral or string only)")
    }
  }

  /** Explicit-register HyperLogLog (Flajolet et al. 2007) in integer-exact
    * arithmetic, per group — the cross-engine-REPRODUCIBLE complement to
    * the opaque builtins above (Spark's `approx_count_distinct` is HLL++
    * with engine-private hashing; this one any engine can replay bit for
    * bit, which is what makes it oracle-checkable and audit-stable).
    *
    * m = 256 registers; the 60-bit md5-prefix hash splits into bucket
    * (low 8 bits) and a 40-bit rank window; rank = leading zeros + 1
    * (41 for an all-zero window). The harmonic-mean estimate
    * alpha·m²/Σ2^(−M_j) is computed entirely in longs by scaling every
    * term to 2^(41−M_j) (empty registers contribute 2^41) and folding
    * alpha·m²·2^41 into one precomputed constant:
    * K = ⌊7213·256000·65536·2^41 / (10000·257079)⌋ (alpha_256 =
    * 0.7213/(1 + 1.079/256) as an exact rational) — estimate = K div S.
    * Small-range correction (raw ≤ 5m/2 with V > 0 empty registers):
    * linear counting m·ln(m/V) via [[lcTable]] — 256 integers computed
    * ONCE here and embedded verbatim in both engines' expressions, so
    * the ln never touches either engine's libm.
    *
    * Scale shape: one map-side-combined max per (group, bucket) — at most
    * 256 rows per group survive the shuffle regardless of input size; the
    * fold to one row per group is a second tiny aggregation. The 100 TB
    * cardinality answer with fixed memory and a replayable answer.
    */
  /** Linear-counting estimates ⌊256·ln(256/V) + ½⌋ for V = 1..256 empty
    * registers — the single source both the Spark expression and the
    * generated oracle SQL embed (see [[lcTableSql]]).
    */
  val lcTable: IndexedSeq[Long] =
    (1 to 256).map(v => math.round(256.0 * math.log(256.0 / v)))

  /** The same table as a SQL array literal, 1-indexed by V. */
  def lcTableSql: String = lcTable.mkString("[", ",", "]")

  /** The per-group register table (g, bucket, mrank) — the MERGEABLE form:
    * registers from any partition of the data (days, sources, shards)
    * roll up by `max(mrank)` per (g, bucket) into exactly the registers
    * of the whole, so per-slice sketches reaggregate without rescanning
    * (q134 pins two-level merge == one-level build through the oracle).
    */
  def hllRegisters(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    df.select(group.as("g"), h.as("h"))
      .select(col("g"), (col("h") % 256).as("bucket"),
        expr("(h div 256) % 1099511627776").as("v40"))
      .select(col("g"), col("bucket"),
        when(col("v40") === 0, lit(41))
          .otherwise(lit(41) - length(conv(col("v40"), 10, 2))).as("rank"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rank")).as("mrank"))
  }

  /** Fold a register table (g, bucket, mrank) to (g, hll_est). */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val K = 103513989865891026L
    regs
      .groupBy(col("g"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 41 - mrank)")).as("sp"),
        count(lit(1)).as("nb"))
      .select(col("g"),
        expr(s"$K div (sp + (256 - nb) * ${1L << 41})").as("raw"),
        (lit(256L) - col("nb")).as("v"))
      .select(col("g"),
        when(col("raw") <= 640 && col("v") > 0,
          element_at(array(lcTable.map(lit): _*), col("v").cast("int")))
          .otherwise(col("raw")).as("hll_est"))
  }

  def hllCountDistinct(df: DataFrame, group: Column, key: Column): DataFrame =
    hllEstimate(hllRegisters(df, group, key))

  /** Deterministic count-min sketch (Cormode & Muthukrishnan 2005) with
    * md5-derived row hashes — like [[hllCountDistinct]], the reproducible
    * twin of the opaque [[countMin]] builtin. d = 4 rows × w = 1024
    * buckets; cell (i, b) holds the summed frequency of every key with
    * md5(key#i) mod w = b, and a point estimate is the min over the 4
    * cells — always ≥ the true count, within eps·N with the standard
    * guarantee. Built FROM the exact per-key counts (one token-stream
    * aggregation, then a vocab-sized 4096-cell fold), so the sketch build
    * never rescans the corpus.
    */
  def countMinDeterministic(counts: DataFrame, key: String, cnt: String): DataFrame = {
    val i = explode(array((0 until 4).map(lit): _*)).as("i")
    counts.select(col(key).as("k"), col(cnt).as("c"), i)
      .select(col("i"),
        (conv(substring(md5(concat(col("k"), lit("#"), col("i"))), 1, 8), 16, 10)
          .cast("long") % 1024).as("bucket"),
        col("c"))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("cell"))
  }
}
