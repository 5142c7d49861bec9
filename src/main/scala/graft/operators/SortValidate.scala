package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Global total-order sort + SortValidator invariant (SURVEY §2.6, §5.4).
  *
  * Reference: `Sort.java:97-161` (TotalOrderPartitioner + InputSampler) and
  * `src/test/org/apache/hadoop/mapred/SortValidator.java:97` — validation
  * checks (a) the output is globally sorted and (b) the xor of record
  * hashes is identical between input and output (sort = permutation).
  *
  * Spark's `orderBy` already IS the reference's total-order machinery: the
  * RangePartitioner reservoir-samples split points exactly like
  * InputSampler.writePartitionFile. What we add is the validator: a
  * single pass over the sorted result computing per-partition
  * (first, last, sorted-within, xor, count), then an O(#partitions) driver
  * check that partition boundaries are non-decreasing. No full collect —
  * one small row per partition, scale-independent.
  */
/** Per-partition stats row (top-level so the encoder codegen resolves the
  * constructor — a nested class made Janino fall back to interpreted mode).
  */
final case class PartStat(
    idx: Int, firstK: Long, firstT: Long, lastK: Long, lastT: Long,
    sortedWithin: Boolean, xor: Long, cnt: Long)

/** Per-partition stats for the binary-key validator (keys carried as hex
  * strings — lexicographic hex order == unsigned byte order, and the
  * encoder stays simple).
  */
final case class PartStatB(
    idx: Int, firstK: String, lastK: String,
    sortedWithin: Boolean, xor: Long, cnt: Long, minK: String, maxK: String,
    vchars: Long)

object SortValidate {

  /** Sort `df` globally by `sortKey` (a sortable long expression) and
    * validate; returns a single-row DataFrame
    * (total_rows, xor_hash, is_sorted). `recHash` is the per-record
    * portable hash that feeds the xor invariant.
    */
  def sortAndValidate(
      spark: SparkSession,
      df: DataFrame,
      sortKey: Column,
      tieBreak: Column,
      recHash: Column): DataFrame = {
    import spark.implicits._
    val sorted = df
      .select(sortKey.cast("long").as("k"), tieBreak.cast("long").as("t"),
        recHash.cast("long").as("h"))
      .orderBy(col("k"), col("t"))
    val stats = sorted
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          var firstK = Long.MinValue; var firstT = Long.MinValue
          var prevK = Long.MinValue; var prevT = Long.MinValue
          var sortedWithin = true; var xor = 0L; var cnt = 0L
          var started = false
          for (r <- rows) {
            val k = r.getLong(0); val t = r.getLong(1); val h = r.getLong(2)
            if (!started) { firstK = k; firstT = t; started = true }
            else if (k < prevK || (k == prevK && t < prevT)) sortedWithin = false
            prevK = k; prevT = t; xor ^= h; cnt += 1
          }
          Iterator.single(PartStat(org.apache.spark.TaskContext.getPartitionId(),
            firstK, firstT, prevK, prevT, sortedWithin, xor, cnt))
        }
      }
      .collect()
      .sortBy(_.idx)
    // boundary order must hold on the FULL (key, tiebreak) tuple — a
    // key tie across a partition edge with tiebreaks out of order is an
    // ordering violation too
    val boundariesOk = stats.sliding(2).forall {
      case Array(a, b) =>
        a.lastK < b.firstK || (a.lastK == b.firstK && a.lastT <= b.firstT)
      case _ => true
    }
    val isSorted = boundariesOk && stats.forall(_.sortedWithin)
    val totalXor = stats.foldLeft(0L)(_ ^ _.xor)
    val totalCnt = stats.map(_.cnt).sum
    Seq((totalCnt, totalXor, isSorted))
      .toDF("total_rows", "xor_hash", "is_sorted")
  }

  /** Portable per-record hash for the xor invariant (engine-identical, see
    * [[Hashing.hash32]]).
    */
  def recordHash(c: Column): Column = Hashing.hash32(c)

  /** TeraSort-proper: globally sort 100-byte records by their 10-byte
    * BINARY key (`TeraGen.java:50-53` layout) and validate TeraValidate's
    * invariants — global order, count, record-hash xor (sort = permutation)
    * — plus min/max key. The full record (`value`) rides through the sort
    * so the shuffle moves real record bytes, not just keys. One stats row
    * per partition reaches the driver; everything else is distributed.
    * Spark's BinaryType ordering is unsigned lexicographic, matching the
    * reference's `BytesWritable` comparator; validation compares lowercase
    * hex images, whose string order equals unsigned byte order.
    */
  def teraSortValidate(
      spark: SparkSession,
      df: DataFrame,
      keyBin: Column,
      value: Column,
      recHash: Column): DataFrame = {
    import spark.implicits._
    val sorted = df
      .select(keyBin.as("k"), value.as("v"), recHash.cast("long").as("h"))
      .orderBy(col("k"))
    // the stats pass CONSUMES the value column (its total width is part of
    // the validated output) — without that reference, column pruning would
    // project v away below the sort and the shuffle would move 30-byte
    // (key, hash) rows instead of the full records, silently turning the
    // TeraSort bench into a key-only sort
    val stats = sorted
      .select(lower(hex(col("k"))).as("kh"), col("v"), col("h"))
      .as[(String, String, Long)]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          var firstK: String = null; var prevK: String = null
          var minK: String = null; var maxK: String = null
          var sortedWithin = true; var xor = 0L; var cnt = 0L
          var vchars = 0L
          for ((k, v, h) <- rows) {
            if (firstK == null) firstK = k
            else if (k < prevK) sortedWithin = false
            if (minK == null || k < minK) minK = k
            if (maxK == null || k > maxK) maxK = k
            prevK = k; xor ^= h; cnt += 1; vchars += v.length
          }
          Iterator.single(PartStatB(
            org.apache.spark.TaskContext.getPartitionId(),
            firstK, prevK, sortedWithin, xor, cnt, minK, maxK, vchars))
        }
      }
      .collect()
      .sortBy(_.idx)
    val boundariesOk = stats.sliding(2).forall {
      case Array(a, b) => a.lastK <= b.firstK
      case _ => true
    }
    val isSorted = boundariesOk && stats.forall(_.sortedWithin)
    Seq((
      stats.map(_.cnt).sum,
      stats.foldLeft(0L)(_ ^ _.xor),
      isSorted,
      if (stats.isEmpty) "" else stats.map(_.minK).min,
      if (stats.isEmpty) "" else stats.map(_.maxK).max,
      stats.map(_.vchars).sum))
      .toDF("total_rows", "xor_hash", "is_sorted", "min_key", "max_key",
        "value_chars")
  }

  /** Shared per-partition fold for sorted-output validators: over (key,
    * recordHash) rows in partition order, returns (sorted-within, xor of
    * hashes, row count). Used by the streaming API-sort check; the richer
    * validators above add boundary keys and byte totals to the same shape.
    */
  def partitionFold(rows: Iterator[(String, Long)]): (Boolean, Long, Long) = {
    var prev: String = null; var ok = true; var xor = 0L; var cnt = 0L
    for ((k, h) <- rows) {
      if (prev != null && k < prev) ok = false
      prev = k; xor ^= h; cnt += 1
    }
    (ok, xor, cnt)
  }
}
