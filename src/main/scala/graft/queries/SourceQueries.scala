package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Sources/sinks surface (SURVEY §2.1): KV-text in/out with
  * first-separator split, partitionBy multi-output routing, the
  * SequenceFile shim, scan-time record filters, heterogeneous
  * MultipleInputs union, and set operations. Round-trips write to a
  * per-query temp dir then read back — the read path is what's verified.
  */
object SourceQueries {

  private def tmp(name: String): String = graft.core.Graft.scratch(name)

  /** KV-text sink + source (`TextOutputFormat` / `KeyValueTextInputFormat`
    * + `KeyValueLineRecordReader`): write `key \t value` lines, read back,
    * split on the FIRST separator only (a tab inside the value survives).
    */
  val q40KvText = Q.checked(
    "q40_kvtext",
    """SELECT n_name AS key, CAST(n_nationkey AS VARCHAR) || chr(9) || CAST(n_regionkey AS VARCHAR) AS value
      |FROM nation""") { (s, dir) =>
    val out = tmp("kvtext")
    // un-coalesced: one file per task, like the reference's part-NNNNN
    // outputs — a coalesce(1) here would serialize the sink on one core
    table(s, dir, "nation")
      .select(concat_ws("\t", col("n_name"), col("n_nationkey"), col("n_regionkey")).as("value"))
      .write.mode("overwrite").text(out)
    // read back: key = text before the first \t, value = everything after
    s.read.text(out)
      .select(
        substring_index(col("value"), "\t", 1).as("key"),
        expr("substring(value, instr(value, '\t') + 1)").as("value"))
  }

  /** Multi-output routing (`MultipleOutputs`/`MultipleOutputFormat`):
    * write orders partitioned by status (file-name-from-key), read the
    * partitioned layout back and aggregate — the round trip proves the
    * routing preserved every record under its key-derived path.
    */
  val q41MultiOutput = Q.checked(
    "q41_multi_output",
    """SELECT o_orderstatus, count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust
      |FROM orders GROUP BY o_orderstatus""") { (s, dir) =>
    val out = tmp("multiout")
    table(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_custkey"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
  }

  /** Named side outputs with HETEROGENEOUS schemas and formats — the full
    * `MultipleOutputs.addNamedOutput(job, name, format, keyClass,
    * valueClass)` surface (reference
    * src/mapred/org/apache/hadoop/mapred/lib/MultipleOutputs.java:60-120),
    * where each named output declares its OWN OutputFormat and key/value
    * types, distinct from the job's base output. q41 covers the
    * homogeneous key-routed case via `partitionBy`; this covers the
    * general one. Spark-first mapping: materialize the upstream ONCE
    * (localCheckpoint — the single map/reduce pass the reference makes),
    * then one narrow write per named output, each with its own schema and
    * format (parquet base + tab-text counts + json sums). The read-back
    * union proves every output's round trip through its own format;
    * column-count/type divergence across outputs is the point.
    */
  val q41bNamedOutputs = Q.checked(
    "q41b_named_outputs",
    """SELECT 'base' AS out, CAST(o_orderkey AS VARCHAR) AS k, CAST(o_custkey AS VARCHAR) AS v FROM orders
      |UNION ALL
      |SELECT 'status', o_orderstatus, CAST(CAST(count(*) AS BIGINT) AS VARCHAR) FROM orders GROUP BY o_orderstatus
      |UNION ALL
      |SELECT 'pri', o_orderpriority, CAST(CAST(sum(o_custkey) AS BIGINT) AS VARCHAR) FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
    val out = tmp("namedout")
    // the single upstream pass all three outputs share
    val orders = table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"))
      .localCheckpoint(true)
    // base output: full detail, parquet, (long, long)
    orders.select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").parquet(s"$out/base")
    // named output "status": (string, long) as tab-separated text
    orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .select(concat_ws("\t", col("o_orderstatus"), col("n")).as("value"))
      .write.mode("overwrite").text(s"$out/status")
    // named output "pri": (string, long) as json
    orders.groupBy(col("o_orderpriority")).agg(sum(col("o_custkey")).as("sum_cust"))
      .write.mode("overwrite").json(s"$out/pri")
    val base = s.read.parquet(s"$out/base")
      .select(lit("base").as("out"), col("o_orderkey").cast("string").as("k"),
        col("o_custkey").cast("string").as("v"))
    val status = s.read.text(s"$out/status")
      .select(lit("status").as("out"),
        substring_index(col("value"), "\t", 1).as("k"),
        substring_index(col("value"), "\t", -1).as("v"))
    val pri = s.read.json(s"$out/pri")
      .select(lit("pri").as("out"), col("o_orderpriority").as("k"),
        col("sum_cust").cast("string").as("v"))
    base.unionByName(status).unionByName(pri)
  }

  /** SequenceFile shim (`SequenceFileInput/OutputFormat`): RDD
    * saveAsSequenceFile → sc.sequenceFile round trip for K/V compat with
    * reference-era data; Parquet remains the native format.
    */
  val q42SeqFile = Q.checked(
    "q42_seqfile",
    "SELECT n_name AS key, CAST(n_nationkey AS VARCHAR) AS value FROM nation") { (s, dir) =>
    val out = tmp("seqfile")
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    table(s, dir, "nation")
      .select(col("n_name"), col("n_nationkey").cast("string"))
      .rdd.map(r => (r.getString(0), r.getString(1)))
      .saveAsSequenceFile(out)
    import s.implicits._
    s.sparkContext.sequenceFile[String, String](out).toDF("key", "value")
  }

  /** Binary SequenceFile passthrough (`SequenceFileAsBinaryInputFormat` /
    * `SequenceFileAsBinaryOutputFormat`): raw `BytesWritable` K/V moved
    * without any text decode — the legacy-data migration path. Keys are
    * raw MD5 digests (arbitrary non-UTF-8 bytes), so a green oracle proves
    * byte fidelity, not just string round-tripping; the compare itself is
    * over hex encodings because the harness diffs text.
    */
  val q42bSeqFileBinary = Q.checked(
    "q42b_seqfile_binary",
    """SELECT md5(n_name) AS key_hex,
      |       lower(hex(encode(n_name || ':' || CAST(n_nationkey AS VARCHAR)))) AS value_hex
      |FROM nation""") { (s, dir) =>
    val out = tmp("seqfilebin")
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    table(s, dir, "nation")
      .select(
        unhex(md5(col("n_name"))).as("k"),
        encode(concat(col("n_name"), lit(":"), col("n_nationkey").cast("string")),
          "UTF-8").as("v"))
      .rdd.map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
      .saveAsSequenceFile(out) // BytesWritable pairs via the byte-array converter
    import s.implicits._
    s.sparkContext.sequenceFile[Array[Byte], Array[Byte]](out)
      .toDF("k", "v")
      .select(lower(hex(col("k"))).as("key_hex"),
        lower(hex(col("v"))).as("value_hex"))
  }

  /** SequenceFileAsText (`SequenceFileAsTextInputFormat`): any
    * SequenceFile read with each writable rendered via `toString` — the
    * reference's text view over typed K/V data. The fixture is written
    * with NON-text writables (LongWritable keys), so a green row proves
    * the toString decode, not a Text round trip. The input format class
    * itself is Hadoop's own (on Spark's classpath) — reused, not
    * re-implemented, exactly as SURVEY §4 prescribes for the I/O layer.
    */
  val q42cSeqFileAsText = Q.checked(
    "q42c_seqfile_astext",
    """SELECT CAST(n_nationkey AS VARCHAR) AS key, n_name AS value
      |FROM nation""") { (s, dir) =>
    val out = tmp("seqfileastext")
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    table(s, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .saveAsSequenceFile(out) // LongWritable / Text pairs
    import s.implicits._
    s.sparkContext
      .hadoopFile(out,
        classOf[org.apache.hadoop.mapred.SequenceFileAsTextInputFormat],
        classOf[org.apache.hadoop.io.Text], classOf[org.apache.hadoop.io.Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }

  /** Scan-time record filters (`SequenceFileInputFilter`:
    * Regex / MD5-sample / percent): three filter modes over customer keys,
    * reported as per-mode counts. The MD5 filter reuses the portable hash
    * so sampling is deterministic on any engine or cluster.
    */
  val q43ScanFilters = Q.checked(
    "q43_scan_filters",
    """SELECT
      |  (SELECT count(*) FROM customer WHERE regexp_matches(c_name, 'Customer#0*1[0-9]$')) AS regex_n,
      |  (SELECT count(*) FROM customer WHERE ('0x' || substring(md5(c_name), 1, 8))::BIGINT % 16 = 0) AS md5_n,
      |  (SELECT count(*) FROM customer WHERE c_custkey % 10 = 0) AS nth_n""") { (s, dir) =>
    val c = table(s, dir, "customer")
    val regexN = c.filter(col("c_name").rlike("Customer#0*1[0-9]$"))
      .agg(count(lit(1)).as("regex_n"))
    val md5N = c.filter(Hashing.md5Sample(col("c_name"), 16))
      .agg(count(lit(1)).as("md5_n"))
    val nthN = c.filter(col("c_custkey") % 10 === 0)
      .agg(count(lit(1)).as("nth_n"))
    regexN.crossJoin(md5N).crossJoin(nthN)
  }

  /** MultipleInputs heterogeneous union (`DelegatingInputFormat`): two
    * differently-shaped sources normalized per-path then unioned by name
    * with a source tag.
    */
  val q44MultiInputs = Q.checked(
    "q44_multi_inputs",
    """SELECT src, count(*) AS n, min(name) AS min_name FROM (
      |  SELECT 'customer' AS src, c_name AS name FROM customer
      |  UNION ALL
      |  SELECT 'supplier' AS src, s_name AS name FROM supplier
      |) GROUP BY src""") { (s, dir) =>
    val c = table(s, dir, "customer")
      .select(lit("customer").as("src"), col("c_name").as("name"))
    val p = table(s, dir, "supplier")
      .select(lit("supplier").as("src"), col("s_name").as("name"))
    c.unionByName(p)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), min(col("name")).as("min_name"))
  }

  /** Set operations (SURVEY §2.7): customers having both an 'O' and an 'F'
    * order (intersect) and 'O'-only customers (except), via Spark's native
    * INTERSECT/EXCEPT.
    */
  val q45SetOps = Q.checked(
    "q45_setops",
    """SELECT
      |  (SELECT count(*) FROM (
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |     INTERSECT
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS both_n,
      |  (SELECT count(*) FROM (
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |     EXCEPT
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS only_o_n""") { (s, dir) =>
    val o = table(s, dir, "orders")
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val filled = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.intersect(filled).agg(count(lit(1)).as("both_n"))
      .crossJoin(open.except(filled).agg(count(lit(1)).as("only_o_n")))
  }

  /** Record-DDL-driven scan (SURVEY §1.2b end-to-end): a `.jr` class
    * declaration — parsed by `core/RecordDDL` — supplies the schema for a
    * delimited-text read, the way the reference's `rcc`-generated record
    * classes typed legacy K/V data. The oracle recomputes from the parquet
    * source, so a green row proves the DDL-declared schema read the text
    * back with correct names AND types (the sum is over a DDL-typed long).
    */
  val q94RecordDdl = Q.checked(
    "q94_record_ddl",
    """SELECT l_returnflag AS flag, count(*) AS n,
      |       CAST(sum(l_linenumber) AS BIGINT) AS s
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    import graft.core.RecordDDL
    val out = tmp("recddl")
    table(s, dir, "lineitem")
      .select(concat_ws("\t",
        col("l_returnflag"), col("l_linenumber"), col("l_orderkey")).as("line"))
      .write.mode("overwrite").text(out)
    val schema = RecordDDL.schemas(
      """module graft.demo {
        |  class LineRec {
        |    ustring flag;
        |    long    lineno;
        |    long    orderkey;
        |  }
        |}""".stripMargin)("graft.demo.LineRec")
    s.read.schema(schema).option("sep", "\t").csv(out)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("lineno")).as("s"))
  }

  /** Unsplittable-gzip text semantics (SURVEY §7.4 risk 6;
    * `TextInputFormat.java:41` `isSplitable` = codec-aware,
    * `LineRecordReader.java:111`): a `.gz` text file must be read as ONE
    * split, decompressed whole, and a directory mixing plain and gzipped
    * parts must dispatch the codec per file extension — the reference's
    * everyday log-ingest layout. The fixture is the nation table written
    * twice, once plain and once gzip; reading both dirs back through the
    * text scan doubles every count, so the oracle is `2×count` over the
    * source table. A green row proves the decompressed records parse
    * identically to the uncompressed ones (codec dispatch, no
    * mid-stream split corruption); XmlScanSpec pins the single-split
    * contract itself on the scan's partitioning.
    */
  val q111GzipText = Q.checked(
    "q111_gzip_text",
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |       2 * count(*) AS n, min(n_name) AS min_name
      |FROM nation GROUP BY 1""") { (s, dir) =>
    val base = tmp("gziptext")
    val lines = table(s, dir, "nation")
      .select(concat_ws("|",
        col("n_name"), col("n_nationkey"), col("n_regionkey")).as("value"))
    lines.write.mode("overwrite").text(s"$base/plain")
    lines.write.mode("overwrite").option("compression", "gzip").text(s"$base/gz")
    s.read.text(s"$base/plain", s"$base/gz")
      .select(split(col("value"), "\\|").as("f"))
      .select(element_at(col("f"), 3).cast("long").as("n_regionkey"),
        element_at(col("f"), 1).as("n_name"))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("min_name"))
  }

  /** Splittable bzip2 text — the codec-semantics COMPLEMENT of q111:
    * hadoop-1's BZip2Codec is the era's one splittable compression
    * (HADOOP-4012; reference src/core/org/apache/hadoop/io/compress/
    * BZip2Codec.java implements SplittableCompressionCodec), so a single
    * large .bz2 file fans out across tasks at compression-block
    * boundaries where a .gz file pins to one split. The oracle proves
    * the lossless round trip; MiscSpec("bzip2 text splits...") proves
    * the MULTI-SPLIT property on a file big enough to span blocks —
    * at 100 TB this is the difference between a parallel scan and one
    * straggler task per log file.
    */
  val q111bBzip2Text = Q.checked(
    "q111b_bzip2_text",
    """SELECT doc_id % 10 AS bucket, count(*) AS n,
      |  CAST(sum(length(text)) AS BIGINT) AS chars
      |FROM documents GROUP BY 1""") { (s, dir) =>
    val base = tmp("bz2text")
    table(s, dir, "documents")
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
      .write.mode("overwrite").option("compression", "bzip2").text(base)
    s.read.text(base)
      .select(
        substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("text"))
      .groupBy((col("doc_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
  }

  /** Parquet schema evolution (`mergeSchema`): two generations of the
    * same table written with DIFFERENT schemas — an old batch lacking a
    * later-added column, a new batch lacking a retired one — read back as
    * ONE table whose unified schema nulls the absent columns per file.
    * The lakehouse reality at 100 TB: a table's files span years of
    * schema versions and a scan must reconcile them without a rewrite.
    * The aggregate proves per-generation null semantics, not just the
    * union of names.
    */
  val q137SchemaMerge = Q.checked(
    "q137_schema_merge",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END) AS BIGINT) AS n_cust,
      |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END) AS BIGINT) AS sum_cust,
      |  CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN o_custkey END) AS BIGINT) AS n_cust2,
      |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 2 * o_custkey END) AS BIGINT) AS sum_cust2
      |FROM orders""") { (s, dir) =>
    val out = tmp("schemamerge")
    val orders = table(s, dir, "orders")
    // generation 1: (o_orderkey, o_custkey)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    // generation 2: o_custkey retired, o_custkey2 added
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("o_custkey2"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    s.read.option("mergeSchema", "true").parquet(s"$out/gen=1", s"$out/gen=2")
      .agg(count(lit(1)).as("n"),
        count(col("o_custkey")).as("n_cust"),
        sum(col("o_custkey")).as("sum_cust"),
        count(col("o_custkey2")).as("n_cust2"),
        sum(col("o_custkey2")).as("sum_cust2"))
  }

  /** CSV source with corrupt-record ROUTING — the structured-text member
    * of the bad-input family (q46 skips bad records in a pipe, this row
    * quarantines them at the parser): a CSV lake is synthesized from
    * events with a deterministic corruption (every event_id % 37 = 0 row
    * carries a non-numeric value field), read back under PERMISSIVE mode
    * with `columnNameOfCorruptRecord`, and every row is routed — parsed
    * rows into the exact scaled aggregate, malformed rows into the
    * quarantine count with an identity checksum (sum of their ids, so a
    * mis-routed row moves two cells, not one). The oracle knows the
    * corruption rule, so green proves the parser's routing matches the
    * rule exactly — no silent drop, no silent null-fill. Scale: the CSV
    * scan is splittable line-format, parsing is map-side, one 2-group
    * aggregate.
    */
  val q178CsvSource = Q.checked(
    "q178_csv_source",
    """WITH e AS (
      |  SELECT event_id,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events)
      |SELECT 'bad' AS kind, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS tot
      |FROM e WHERE event_id % 37 = 0
      |UNION ALL
      |SELECT 'good', count(*), CAST(sum(v) AS BIGINT)
      |FROM e WHERE event_id % 37 <> 0""") { (s, dir) =>
    val lake = tmp("csv-events")
    table(s, dir, "events")
      .select(concat_ws(",", col("event_id"), col("user_id"),
        when(col("event_id") % 37 === 0, lit("abc"))
          .otherwise(col("value").cast("string"))).as("value"))
      .write.mode("overwrite").text(lake)
    val parsed = s.read
      .schema("event_id LONG, user_id LONG, value DOUBLE, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(lake)
    parsed
      .select(when(col("_corrupt").isNull, "good").otherwise("bad").as("kind"),
        col("event_id"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kind") === "good", col("v"))
          .otherwise(col("event_id"))).as("tot"))
  }

  val all: Vector[Q] =
    Vector(q40KvText, q41MultiOutput, q41bNamedOutputs, q42SeqFile, q42bSeqFileBinary,
      q42cSeqFileAsText, q43ScanFilters, q44MultiInputs, q45SetOps,
      q94RecordDdl, q111GzipText, q111bBzip2Text, q137SchemaMerge,
      q178CsvSource)
}
