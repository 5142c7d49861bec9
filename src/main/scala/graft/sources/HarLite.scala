package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hadoop-archive utility parity
  * (`/root/reference/src/tools/org/apache/hadoop/tools/HadoopArchives.java:77`,
  * `HarFileSystem.java`): pack a tree of small files into a few big,
  * indexed part files so the namenode stops paying one object per tiny
  * file, while every archived file stays individually addressable.
  *
  * Spark-first mapping (SURVEY §1.3 — the sorted-file family is sorted
  * Parquet): the archive is a `part/` parquet table `(path, length,
  * content)` range-partitioned and sorted by path — parquet row-group
  * min/max stats on the sorted path column play the role of
  * `_masterindex`, so a single-file read prunes to one row group instead
  * of scanning a part file — plus a content-free `_index/` manifest
  * (the `_index` analogue) for listings that must not touch payload
  * bytes. Part count derives from total bytes over [[defaultPartBytes]],
  * the same `har.partfile.size` contract as the reference (2 GiB
  * default, `HadoopArchives.java:96`); ranges are row-balanced rather
  * than byte-balanced, which is the right trade once files are small —
  * the case HAR exists for.
  */
object HarLite {

  /** Reference default part-file size (`partSize = 2*1024*1024*1024L`). */
  val defaultPartBytes: Long = 2L * 1024 * 1024 * 1024

  private def partDir(archiveDir: String) = s"$archiveDir/part"
  private def indexDir(archiveDir: String) = s"$archiveDir/_index"

  /** Pack every file under `srcDir` (recursively) into `archiveDir`.
    * Paths are stored relative to `srcDir`, preserving subdirectories.
    */
  def build(spark: SparkSession, srcDir: String, archiveDir: String,
      partBytes: Long = defaultPartBytes): Unit = {
    require(partBytes > 0, s"partBytes must be positive: $partBytes")
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(srcDir)

    val prefix = "file:" + new java.io.File(srcDir).getCanonicalPath + "/"
    val sample = files.select(col("path")).limit(1).collect()
    require(sample.nonEmpty, s"HarLite.build: no files under $srcDir")
    require(sample.head.getString(0).startsWith(prefix),
      s"unexpected path form '${sample.head.getString(0)}' for prefix '$prefix'")

    // Sizing pass reads only listing metadata (the reference's src.list
    // walk), never content bytes.
    val totalBytes = files.agg(sum(col("length"))).head().getLong(0)
    val nParts = math.max(1L, (totalBytes + partBytes - 1) / partBytes)
      .min(100000L).toInt

    files
      .select(
        col("path").substr(lit(prefix.length + 1), lit(Int.MaxValue))
          .as("path"),
        col("length"), col("content"))
      .repartitionByRange(nParts, col("path"))
      .sortWithinPartitions(col("path"))
      .write.mode("overwrite").parquet(partDir(archiveDir))

    // The `_index` analogue: path → length, sorted, content-free.
    spark.read.parquet(partDir(archiveDir))
      .select(col("path"), col("length"))
      .repartitionByRange(1, col("path"))
      .sortWithinPartitions(col("path"))
      .write.mode("overwrite").parquet(indexDir(archiveDir))
  }

  /** Full packed table `(path, length, content)`. */
  def open(spark: SparkSession, archiveDir: String): DataFrame =
    spark.read.parquet(partDir(archiveDir))

  /** Listing from the manifest — never reads content bytes. */
  def ls(spark: SparkSession, archiveDir: String): DataFrame =
    spark.read.parquet(indexDir(archiveDir))

  /** One archived file's bytes: a point filter on the sorted path column,
    * answered by row-group stats pruning (`HarFileSystem.open` parity).
    */
  def cat(spark: SparkSession, archiveDir: String, path: String): DataFrame =
    open(spark, archiveDir).filter(col("path") === path).select(col("content"))
}
