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

  /** SetFile parity (`src/core/org/apache/hadoop/io/SetFile.java:26` — "a
    * file-based set of keys", a MapFile whose values are all null): the
    * distinct sorted key set written as range-partitioned sorted parquet,
    * membership probe = left join against it (stats-pruned like q34's
    * point lookup). Probes mix present and absent keys so the FALSE path
    * is exercised too.
    */
  val q34cSetFile = Q.checked(
    "q34c_setfile",
    """SELECT CAST(k AS BIGINT) AS key,
      |  k IN (SELECT o_custkey FROM orders) AS present
      |FROM (SELECT unnest([1, 4, 777, 999999]) AS k)""") { (s, dir) =>
    val out = tmp("setfile")
    table(s, dir, "orders")
      .select(col("o_custkey").as("key")).distinct()
      .repartitionByRange(4, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").parquet(out)
    val set = s.read.parquet(out).withColumn("present", lit(true))
    s.range(0, 1).select(
        explode(array(lit(1L), lit(4L), lit(777L), lit(999999L))).as("key"))
      .join(set, Seq("key"), "left")
      .select(col("key"), coalesce(col("present"), lit(false)).as("present"))
  }

  /** ArrayFile parity (`src/core/org/apache/hadoop/io/ArrayFile.java:29` —
    * a MapFile keyed by the append position 0..n-1): contiguous indices
    * are assigned DISTRIBUTED — range-partition + sort by the append
    * order key, then `zipWithIndex` (per-partition counts + one offset
    * pass, never a single-partition global window) — written sorted by
    * idx, and `arr[i]` reads back as a stats-pruned point filter.
    */
  val q34dArrayFile = Q.checked(
    "q34d_arrayfile",
    """SELECT idx, value FROM (
      |  SELECT row_number() OVER (ORDER BY c_custkey) - 1 AS idx,
      |         c_name AS value
      |  FROM customer)
      |WHERE idx IN (0, 49, 120)""") { (s, dir) =>
    import s.implicits._
    val out = tmp("arrayfile")
    val sorted = table(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
      .repartitionByRange(4, col("c_custkey"))
      .sortWithinPartitions(col("c_custkey"))
      .as[(Long, String)]
    sorted.rdd.zipWithIndex
      .map { case ((_, name), i) => (i, name) }
      .toDF("idx", "value")
      .repartitionByRange(4, col("idx"))
      .sortWithinPartitions(col("idx"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).filter(col("idx").isin(0L, 49L, 120L))
  }

  /** TFile parity (`src/core/org/apache/hadoop/io/file/tfile/TFile.java:128`
    * — block-compressed K/V sorted by RAW BYTE order, memcmp): binary keys
    * written range-partitioned + sorted (Spark's BinaryType ordering IS
    * unsigned lexicographic memcmp, parquet pages are the compressed
    * blocks), then a byte-range scan [0x10, 0x20) answered by binary
    * comparisons against the sorted layout. The oracle orders lowercase
    * hex strings — equal to memcmp on the bytes — so a green row pins the
    * byte-order contract cross-engine.
    */
  val q34eTFile = Q.checked(
    "q34e_tfile",
    """SELECT count(*) AS n,
      |  min(md5(c_name)) AS min_key_hex,
      |  max(md5(c_name)) AS max_key_hex,
      |  CAST(count(*) FILTER (WHERE substring(md5(c_name), 1, 2) >= '10'
      |                          AND substring(md5(c_name), 1, 2) < '20') AS BIGINT) AS range_n,
      |  CAST(coalesce(sum(c_custkey) FILTER (WHERE substring(md5(c_name), 1, 2) >= '10'
      |                          AND substring(md5(c_name), 1, 2) < '20'), 0) AS BIGINT) AS range_sum
      |FROM customer""") { (s, dir) =>
    val out = tmp("tfile")
    table(s, dir, "customer")
      .select(unhex(md5(col("c_name"))).as("key"), col("c_custkey").as("value"))
      .repartitionByRange(4, col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").parquet(out)
    val kv = s.read.parquet(out)
    val inRange = col("key") >= lit(Array(0x10.toByte)) &&
      col("key") < lit(Array(0x20.toByte))
    kv.agg(
      count(lit(1)).as("n"),
      min(lower(hex(col("key")))).as("min_key_hex"),
      max(lower(hex(col("key")))).as("max_key_hex"),
      count(when(inRange, 1)).as("range_n"),
      coalesce(sum(when(inRange, col("value"))), lit(0L)).as("range_sum"))
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

  /** Hadoop-archive round trip ([[graft.sources.HarLite]] —
    * `HadoopArchives.java:77` parity): docs are first materialized as
    * REAL individual small files (distributed `foreachPartition` writers,
    * the namenode-hostile input shape HAR exists to fix), packed into the
    * sorted-parquet archive, then read back THROUGH the archive. The
    * oracle recomputes `(path, length, md5)` from the generation formula
    * without touching a file, so a green row proves filenames, byte
    * lengths, and full content all survived the pack. A small `partBytes`
    * forces multiple part files so range packing itself is exercised.
    */
  val q99Har = Q.checked(
    "q99_har",
    """SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
      |  CAST(length(text) AS BIGINT) AS length,
      |  md5(text) AS content_md5
      |FROM documents WHERE doc_id < 400""") { (s, dir) =>
    import s.implicits._
    import graft.sources.HarLite
    val src = tmp("har_src")
    val arch = tmp("har_arch")
    table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        val d = java.nio.file.Paths.get(src)
        java.nio.file.Files.createDirectories(d)
        it.foreach { case (id, text) =>
          java.nio.file.Files.write(d.resolve(s"doc$id.txt"),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    HarLite.build(s, src, arch, partBytes = 64 * 1024)
    HarLite.open(s, arch)
      .select(col("path"), col("length"),
        md5(col("content")).as("content_md5"))
  }

  /** ORC interchange — the Hive-era columnar store of the reference's
    * ecosystem (RCFile/ORC lineage) as a Spark-native sink + source: write
    * a sorted lineitem projection as ORC, read it back, aggregate. The
    * oracle computes the identical aggregate from the parquet table
    * directly, so a green row proves the ORC round trip is lossless
    * (exact decimals, strings, keys). The range-partitioned sorted layout
    * gives ORC stripe min/max stats the same prune role parquet row
    * groups play in q34 — and at 100 TB the interchange IS the operator:
    * a corpus written once as ORC stays predicate-prunable without a
    * rewrite to parquet.
    */
  val q117OrcInterchange = Q.checked(
    "q117_orc_interchange",
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_orderkey % 7 = 0
      |GROUP BY l_returnflag""") { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val out = tmp("orcstore")
    table(s, dir, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(DecimalType(18, 4))), 2)
          .cast("double").as("sum_qty"))
  }

  /** Compaction planning — the table-maintenance step every small-file
    * store eventually needs (Delta/Iceberg OPTIMIZE, HDFS har-ing, the
    * q35 combine-scan's WRITE-side twin): given a file manifest (id,
    * size), assign files in manifest order to target-size output bins by
    * exact cumulative offset — bin = start_off div target, the same
    * streaming-concat rule Spark's own file coalescing uses — and emit
    * the per-bin plan (file count, bytes, id range). Contiguous
    * assignment preserves whatever clustering the manifest order encodes
    * (a sorted table stays sorted after compaction), which is why real
    * compactors do NOT first-fit-decreasing across the whole table.
    *
    * The cumulative offsets are [[graft.operators.Packing.sizeOffsets]] —
    * the two-pass distributed prefix sum, no single-partition window; the
    * oracle computes the same offsets with a window cumsum. Two
    * algorithms, one answer. The manifest here is the documents table
    * (doc_id, n_chars) standing in for (file, bytes).
    */
  val q145CompactionPlan = Q.checked(
    "q145_compaction_plan",
    """WITH f AS (
      |  SELECT doc_id, n_chars,
      |    CAST(COALESCE(sum(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      |  FROM documents)
      |SELECT CAST(start_off // 4000 AS BIGINT) AS bin, count(*) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bin_chars,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM f GROUP BY 1""") { (s, dir) =>
    import graft.operators.Packing
    Packing.sizeOffsets(
        table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars")
      .groupBy(expr("start_off div 4000").as("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bin_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  val all: Vector[Q] =
    Vector(q34MapFile, q34bBloomFile, q34cSetFile, q34dArrayFile, q34eTFile,
      q35MultiFileWordCount, q56RandomText, q99Har, q117OrcInterchange,
      q145CompactionPlan)
}
