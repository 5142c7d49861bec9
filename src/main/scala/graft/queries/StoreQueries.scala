package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Sorted-output lookup (MapFile parity), small-file combine scan
  * (MultiFileWordCount), and deterministic data generation
  * (RandomTextWriter) — the remaining storage/corpus rows of SURVEY §2.
  */
object StoreQueries {

  private def tmp(name: String): String = graft.core.Graft.scratch(name)

  /** MapFileOutputFormat parity (`MapFileOutputFormat.java`): write sorted
    * by key (range-partitioned + sorted within partitions = the MapFile
    * layout; parquet min/max row-group stats are the index), then point
    * lookup = filter on the key, answered by stats pruning not a scan.
    */
  val q34MapFile = Q.checked(
    "q34_mapfile",
    """SELECT c_custkey AS key, c_name AS value FROM customer
      |WHERE c_custkey IN (42, 777, 1400)""") { (s, dir) =>
    val out = tmp("mapfile")
    table(s, dir, "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("value"))
      .repartitionByRange(4, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).filter(col("key").isin(42L, 777L, 1400L))
  }

  /** BloomMapFile membership sidecar (`src/core/org/apache/hadoop/io/
    * BloomMapFile.java`): a bloom filter rides with the sorted data so a
    * point lookup on a miss skips the scan entirely. Spark shape: parquet
    * column bloom filters written at sink time (`parquet.bloom.filter.
    * enabled#col`) — readers consult them per row group, the same
    * skip-on-probable-absence contract. The lookup column (c_name) is NOT
    * the sort column, so min/max stats alone can't prune — only the bloom
    * sidecar can, which is exactly BloomMapFile's reason to exist.
    */
  val q34bBloomFile = Q.checked(
    "q34b_bloom_file",
    """SELECT c_custkey AS key, c_name AS value FROM customer
      |WHERE c_name IN ('Customer#000000042', 'Customer#000000777')""") { (s, dir) =>
    val out = tmp("bloomfile")
    table(s, dir, "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("value"))
      .repartitionByRange(4, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#value", "true")
      .option("parquet.bloom.filter.expected.ndv#value", "200000")
      .parquet(out)
    s.read.parquet(out)
      .filter(col("value").isin("Customer#000000042", "Customer#000000777"))
  }

  /** MultiFileWordCount + CombineFileInputFormat
    * (`MultiFileWordCount.java:58-213`): documents scattered across many
    * small text files, read back as one coalesced scan (Spark packs small
    * files into splits via maxPartitionBytes/openCostInBytes), word-counted.
    */
  val q35MultiFileWordCount = Q.checked(
    "q35_multifile_wordcount",
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS word FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word""") { (s, dir) =>
    val out = tmp("multifile")
    table(s, dir, "documents")
      .select(col("text"))
      .repartition(20) // scatter into many small files
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .select(explode(split(col("value"), "[ \\t\\n\\r\\f\\x0B]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
  }

  /** RandomTextWriter / RandomWriter (`RandomTextWriter.java`):
    * distributed deterministic synthetic text — seeded portable hashes
    * pick words, so any engine (and any cluster size) generates the
    * identical corpus. Validated by full reproduction in the oracle.
    */
  val q56RandomText = Q.checked(
    "q56_randomtext",
    """WITH vocab AS (
      |  SELECT ['alpha','bravo','charlie','delta','echo','foxtrot','golf','hotel'] AS v
      |), g AS (
      |  SELECT i,
      |    (SELECT v FROM vocab)[CAST(('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT % 8 AS BIGINT) + 1]
      |      || ' ' ||
      |    (SELECT v FROM vocab)[CAST(('0x' || substring(md5('1:' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 8 AS BIGINT) + 1] AS line
      |  FROM range(0, 10000) t(i)
      |)
      |SELECT count(*) AS n,
      |       bit_xor(('0x' || substring(md5(line), 1, 8))::BIGINT) AS xor_hash,
      |       min(line) AS min_line, max(line) AS max_line
      |FROM g""") { (s, dir) =>
    val vocab = array(Seq("alpha", "bravo", "charlie", "delta",
      "echo", "foxtrot", "golf", "hotel").map(lit): _*)
    val i = col("id").cast("string")
    val g = s.range(0, 10000).select(
      concat(
        element_at(vocab, (Hashing.hash32Family(i, 0) % 8).cast("int") + 1),
        lit(" "),
        element_at(vocab, (Hashing.hash32Family(i, 4) % 8).cast("int") + 1)).as("line"))
    g.agg(count(lit(1)).as("n"),
      expr("bit_xor(cast(conv(substring(md5(line), 1, 8), 16, 10) as bigint))").as("xor_hash"),
      min(col("line")).as("min_line"), max(col("line")).as("max_line"))
  }

  val all: Vector[Q] =
    Vector(q34MapFile, q34bBloomFile, q35MultiFileWordCount, q56RandomText)
}
