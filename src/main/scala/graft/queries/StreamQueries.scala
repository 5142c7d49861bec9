package graft.queries

import graft.Q
import graft.api.StreamJob
import graft.core.Graft.table
import org.apache.spark.sql.functions._

/** The streaming-CLI front door, verified end-to-end: real text inputs on
  * disk, real external processes (sed/awk), the oracle recomputing the
  * pipeline relationally. These are the invocations a reference user
  * actually types (`hadoop jar streaming.jar -input … -mapper … -reducer …`).
  */
object StreamQueries {

  private def tmp(name: String): String = graft.core.Graft.scratch(name)

  /** `-mapper 'sed …' -reducer aggregate` — the canonical streaming
    * aggregate job (`StreamJob.java:760-764` wires ValueAggregatorReducer):
    * the mapper prefixes each record key with `LongValueSum:`, the
    * aggregate reduce sums per id and emits `id \t total`.
    */
  val q92StreamCli = Q.checked(
    "q92_stream_cli",
    """SELECT event_type AS key, CAST(count(*) AS VARCHAR) AS value
      |FROM events GROUP BY event_type""") { (s, dir) =>
    val in = tmp("q92in")
    table(s, dir, "events")
      .select(concat_ws("\t", col("event_type"), lit("1")).as("line"))
      .write.mode("overwrite").text(in)
    StreamJob.run(s, Seq(
      "-input", in,
      "-mapper", "sed -e s/^/LongValueSum:/",
      "-reducer", "aggregate"))
  }

  /** Full pipeline with identity mapper, external awk combiner AND reducer,
    * a 2-field key (`stream.num.map.output.key.fields=2`), KeyFieldBased
    * partitioner routing, and an explicit reduce count. The awk reducer
    * depends on the MR contract — all rows of a key contiguous and sorted
    * inside one reduce partition — so a green oracle proves the shuffle
    * semantics, not just the arithmetic. The combiner pre-sums per map
    * partition (sum is associative, so the result is unchanged — exactly
    * the reference's combiner contract).
    */
  val q93StreamPipeline = Q.checked(
    "q93_stream_pipeline",
    """SELECT l_returnflag || chr(9) || l_linestatus AS key,
      |       CAST(CAST(sum(l_linenumber) AS BIGINT) AS VARCHAR) AS value
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
    val in = tmp("q93in")
    table(s, dir, "lineitem")
      .select(concat_ws("\t",
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber")).as("line"))
      .write.mode("overwrite").text(in)
    // sums field 3 over runs of equal (field1, field2) keys — correct only
    // if the engine delivers keys contiguous and sorted per partition
    val awkSum = "awk -F'\t' " +
      "'{kk=$1\"\t\"$2} kk!=k{if(NR>1)print k\"\t\"s; k=kk; s=0} {s+=$3} " +
      "END{if(NR>0)print k\"\t\"s}'"
    StreamJob.run(s, Seq(
      "-input", in,
      "-combiner", awkSum,
      "-reducer", awkSum,
      "-partitioner", "KeyFieldBasedPartitioner",
      "-numReduceTasks", "8",
      "-D", "stream.num.map.output.key.fields=2",
      "-D", "stream.num.reduce.output.key.fields=2",
      "-D", "mapred.text.key.partitioner.options=-k1,2"))
  }

  /** Gridmix job 5, the streaming API variant of "API text sort"
    * (`src/benchmarks/gridmix/README`, `streamsort/`): identity mapper and
    * reducer as REAL external processes (`cat`), the framework supplying
    * partition + sort. The MR streaming sort contract is per-reducer
    * order, so the query validates every reduce partition is internally
    * sorted (one stats row per partition) and emits the permutation
    * checksum the oracle can recompute.
    */
  val q66StreamApiSort = Q.checked(
    "q66_stream_api_sort",
    """SELECT count(*) AS total_rows,
      |  bit_xor(('0x'||substring(md5(o_orderpriority || ':' || CAST(o_orderkey AS VARCHAR)),1,8))::BIGINT) AS xor_hash,
      |  TRUE AS is_sorted
      |FROM orders""") { (s, dir) =>
    import graft.functions.Hashing
    import s.implicits._
    val in = tmp("q66in")
    table(s, dir, "orders")
      .select(concat_ws("\t", col("o_orderpriority"), col("o_orderkey")).as("line"))
      .write.mode("overwrite").text(in)
    val sorted = StreamJob.run(s, Seq(
      "-input", in, "-mapper", "cat", "-reducer", "cat",
      "-numReduceTasks", "8"))
    val stats = sorted
      .select(col("key"),
        Hashing.hash32(concat_ws(":", col("key"), col("value"))).as("h"))
      .as[(String, Long)]
      .mapPartitions(rows =>
        Iterator.single(graft.operators.SortValidate.partitionFold(rows)))
      .collect() // one tiny row per reduce partition
    Seq((
      stats.map(_._3).sum,
      stats.foldLeft(0L)(_ ^ _._2),
      stats.forall(_._1)))
      .toDF("total_rows", "xor_hash", "is_sorted")
  }

  val all: Vector[Q] =
    Vector(q66StreamApiSort, q92StreamCli, q93StreamPipeline)
}
