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
}
