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

  /** `-inputformat SequenceFileInputFormat` end-to-end through the CLI
    * facade (`StreamJob.java:690-814` accepts any InputFormat class; the
    * engine routes the SequenceFile family through Hadoop's AsText view,
    * q42c's shim): the fixture is a REAL SequenceFile with a non-text key
    * writable (LongWritable region keys), so a green row proves the
    * toString mapper framing — `key \t value` lines — not a text round
    * trip, then the canonical aggregate reduce over it.
    */
  val q112StreamSeqfile = Q.checked(
    "q112_stream_seqfile",
    """SELECT 'r' || CAST(n_regionkey AS VARCHAR) AS key,
      |       CAST(CAST(sum(n_nationkey) AS BIGINT) AS VARCHAR) AS value
      |FROM nation GROUP BY n_regionkey""") { (s, dir) =>
    val in = tmp("q112in")
    import org.apache.hadoop.fs.Path
    val fs = new Path(in).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(in), true)
    table(s, dir, "nation")
      .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("string"))
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .saveAsSequenceFile(in) // LongWritable / Text pairs
    StreamJob.run(s, Seq(
      "-input", in,
      "-inputformat", "org.apache.hadoop.mapred.SequenceFileInputFormat",
      "-mapper", "awk -F'\t' '{print \"LongValueSum:r\"$1\"\t\"$2}'",
      "-reducer", "aggregate"))
  }

  /** `-outputformat SequenceFileOutputFormat` end-to-end: the q92
    * aggregate pipeline, but the `-output` sink is a real SequenceFile of
    * Text/Text records (no separator framing on disk) and the returned
    * frame is the READ-BACK through the q42 shim — a green row proves the
    * sink wrote what the reducer produced, record-exact.
    */
  val q113StreamSeqfileOut = Q.checked(
    "q113_stream_seqfile_out",
    """SELECT event_type AS key, CAST(count(*) AS VARCHAR) AS value
      |FROM events GROUP BY event_type""") { (s, dir) =>
    val in = tmp("q113in")
    table(s, dir, "events")
      .select(concat_ws("\t", col("event_type"), lit("1")).as("line"))
      .write.mode("overwrite").text(in)
    StreamJob.run(s, Seq(
      "-input", in,
      "-mapper", "sed -e s/^/LongValueSum:/",
      "-reducer", "aggregate",
      "-output", tmp("q113out"),
      "-outputformat", "org.apache.hadoop.mapred.SequenceFileOutputFormat"))
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

  /** `-reducer aggregate` with weighted ValueHistogram values: each mapper
    * output value is `item \t count` split on the LAST tab
    * (`ValueHistogram.java:47-66`), so the per-flag report aggregates
    * sum-of-weights frequencies, not line counts. The oracle recomputes
    * the full [uniq, min, median, max, mean, stddev] report in SQL;
    * mean/stddev render at a fixed 2-decimal scale on both engines (raw
    * double → string would flip to Java scientific notation at 1e7), and
    * the values themselves are dyadic rationals here (n ≤ 2 items per
    * flag), so the 2-decimal rounding is exact, not approximate.
    */
  val q95StreamHistogram = Q.checked(
    "q95_stream_histogram",
    """WITH freq AS (
      |  SELECT l_returnflag AS id, l_linestatus AS item,
      |         CAST(sum(l_linenumber) AS BIGINT) AS f
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT id AS key,
      |  count(*) || chr(9) || min(f) || chr(9) ||
      |  (list_sort(list(f)))[CAST(count(*) // 2 AS BIGINT) + 1] || chr(9) ||
      |  max(f) || chr(9) ||
      |  CAST(CAST(round(CAST(sum(f) AS DOUBLE) / count(*), 2) AS DECIMAL(38,2)) AS VARCHAR) || chr(9) ||
      |  CAST(CAST(round(sqrt(greatest((list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_sort(list(f)), x -> CAST(x AS DOUBLE)*x)), (acc, x) -> acc + x) - CAST(sum(f) AS DOUBLE) * CAST(sum(f) AS DOUBLE) / count(*)) / count(*), 0)), 2) AS DECIMAL(38,2)) AS VARCHAR) AS value
      |FROM freq GROUP BY id""") { (s, dir) =>
    val in = tmp("q95in")
    table(s, dir, "lineitem")
      .select(concat_ws("\t",
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber")).as("line"))
      .write.mode("overwrite").text(in)
    StreamJob.run(s, Seq(
      "-input", in,
      "-mapper", "sed -e s/^/ValueHistogram:/",
      "-reducer", "aggregate"))
  }

  /** Session windows (`session_window`, the Structured Streaming gap-based
    * grouping, exercised in batch where an oracle exists): per-user
    * sessions split at more than 8 h of inactivity (an event exactly
    * gap-after still merges — StreamingSpec pins that boundary), window
    * end = last event + gap.
    * The oracle derives the same sessions relationally (lag + running sum
    * of session marks). The identical `session_window` expression drives
    * the streaming path — StreamingSpec runs it on a stream — so this is
    * the scale shape for streaming sessionization: state per (user ×
    * session), merged by Spark's session-merge exec, no global window.
    * Timestamps travel as epoch micros (never raw TIMESTAMP columns).
    */
  val q68Sessionize = Q.checked(
    "q68_sessionize",
    """WITH us AS (
      |  SELECT user_id, ts, epoch_us(ts) AS ts_us FROM events),
      |marks AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts) > 28800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM us),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
      |  epoch_us(max(ts)) + 28800000000 AS session_end_us,
      |  count(*) AS n_events
      |FROM sess GROUP BY user_id, sid""") { (s, dir) =>
    // Graft.tsUs absorbs the fixture's event-time schema (nanos long vs
    // TIMESTAMP); session_window wants a timestamp column, so rebuild one
    // from the normalized micros
    val ev = table(s, dir, "events")
    ev
      .withColumn("ts", timestamp_micros(graft.core.Graft.tsUs(ev)))
      .groupBy(session_window(col("ts"), "8 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
  }

  /** First-arrival ingest dedup, batch counterpart of
    * [[graft.streaming.EventStream.firstArrivalDedup]]: at-least-once
    * delivery replays the same logical event (here: same user × type ×
    * event-time day), and ingest keeps only the FIRST — deterministically
    * the earliest (event time, event id) row per key, where the streaming
    * path keeps the first *arrival*. One window over the dedup key, rank
    * bounded at 1 — partial WindowGroupLimit prunes losers map-side
    * before the shuffle, so the shuffle carries ≈ one row per key at any
    * scale. StreamingSpec pins the batch/streaming parity: an event-time-
    * ordered feed through the watermarked streaming operator emits
    * exactly this keeper set. Timestamps travel as epoch micros.
    */
  val q122IngestDedup = Q.checked(
    "q122_ingest_dedup",
    """WITH k AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_us(ts) // 86400000000 AS day_bucket, epoch_us(ts) AS ts_us,
      |    row_number() OVER (
      |      PARTITION BY user_id, event_type, epoch_us(ts) // 86400000000
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events)
      |SELECT event_id, user_id, event_type, day_bucket, ts_us
      |FROM k WHERE rn = 1""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // Graft.tsUs normalizes the fixture's event-time schema to epoch
    // micros; day bucketing stays integral from there
    val ev = table(s, dir, "events")
    ev
      .withColumn("ts_us", graft.core.Graft.tsUs(ev))
      .withColumn("day_bucket", expr("ts_us div 86400000000"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("event_type"), col("day_bucket"))
          .orderBy(col("ts_us"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("day_bucket"), col("ts_us"))
  }

  /** Conversation assembly — the SFT-data shaping step that turns an
    * event log into ordered interaction transcripts: q68's gap-based
    * sessions (the same `session_window(ts, '8 hours')` expression, so
    * the boundary semantics are already oracle-pinned) with each
    * session's events REASSEMBLED in (event time, event id) order into a
    * `|`-joined turn string — the per-conversation payload a chat
    * trainer consumes, where q68 only counted.
    *
    * Determinism: the turn order ties on timestamp are broken by
    * event_id on both sides; the engine sorts INSIDE the aggregation
    * buffer (`array_sort(collect_list(struct(ts, id, type)))` — struct
    * ordering is field-lexicographic), never with a window, so a
    * session's turns cost one combiner buffer bounded by session length.
    * Oracle: `string_agg(... ORDER BY ts, event_id)` over the unrolled
    * lag/cumsum session numbering.
    */
  val q148Conversations = Q.checked(
    "q148_conversations",
    """WITH us AS (
      |  SELECT user_id, ts, epoch_us(ts) AS ts_us, event_id, event_type
      |  FROM events),
      |marks AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 28800000000
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM us WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks)
      |SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_turns,
      |  string_agg(event_type, '|' ORDER BY ts_us, event_id) AS turns
      |FROM sess GROUP BY user_id, sid""") { (s, dir) =>
    val ev = table(s, dir, "events")
    val us = graft.core.Graft.tsUs(ev)
    ev
      .withColumn("ts_us", us)
      .withColumn("tsx", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("tsx"), "8 hours"), col("user_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          "|").as("turns"))
      .select(col("user_id"), col("session_start_us"), col("n_turns"),
        col("turns"))
  }

  /** Session path mining — the "what do users actually do" product
    * query: within each q148 session (same gap semantics, same
    * (time, id) turn order), every consecutive 3-step path `a>b>c` is
    * counted corpus-wide and the top-10 paths reported. The engine
    * builds trigrams INSIDE the session aggregation buffer (the q123
    * map-side transform trick over the sorted turn array — no
    * per-session window, no self-join), then one count shuffle and a
    * TakeOrderedAndProject top-k; the oracle derives the same paths by
    * rank self-joins over the unrolled session numbering — two
    * algorithms, one answer.
    */
  val q157EventPaths = Q.checked(
    "q157_event_paths",
    """WITH us AS (
      |  SELECT user_id, ts, epoch_us(ts) AS ts_us, event_id, event_type
      |  FROM events),
      |marks AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 28800000000
      |    THEN 1 ELSE 0 END AS new_s
      |  FROM us WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marks),
      |g AS (
      |  SELECT user_id, sid, event_type,
      |    row_number() OVER (PARTITION BY user_id, sid
      |      ORDER BY ts_us, event_id) AS rn
      |  FROM sess),
      |tri AS (
      |  SELECT a.event_type || '>' || b.event_type || '>' || c.event_type AS path
      |  FROM g a
      |  JOIN g b ON b.user_id = a.user_id AND b.sid = a.sid AND b.rn = a.rn + 1
      |  JOIN g c ON c.user_id = a.user_id AND c.sid = a.sid AND c.rn = a.rn + 2),
      |agg AS (SELECT path, count(*) AS n FROM tri GROUP BY path)
      |SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank
      |FROM agg QUALIFY rank <= 10""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = table(s, dir, "events")
    val us = graft.core.Graft.tsUs(ev)
    ev
      .withColumn("ts_us", us)
      .withColumn("tsx", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("tsx"), "8 hours"), col("user_id"))
      .agg(expr(
        """transform(
          |  array_sort(collect_list(struct(ts_us, event_id, event_type))),
          |  x -> x.event_type)""".stripMargin).as("t"))
      .select(explode(expr(
        """transform(slice(t, 1, greatest(size(t) - 2, 0)),
          |  (x, i) -> concat(x, '>', t[i + 1], '>', t[i + 2]))""".stripMargin))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("path"))))
  }

  /** Event-transition matrix — the first-order Markov model behind
    * next-event prediction and q157's path mining: per user the event
    * stream in (time, event_id) order yields adjacent (cur → next)
    * pairs via ONE per-user lead window (the q81 partitioned-window
    * family — bounded by a user's own history, never global), then the
    * transition counts and the row-normalized probability in integer
    * ppm (cnt·10⁶ div out-degree of cur). Output is |types|² rows at
    * most — model-sized, not event-sized.
    */
  val q189TransitionMatrix = Q.checked(
    "q189_transition_matrix",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
      |p AS (
      |  SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
      |  FROM e),
      |c AS (SELECT cur, nxt, count(*) AS n FROM p WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS outn FROM c GROUP BY cur)
      |SELECT c.cur, c.nxt, c.n,
      |  CAST(CAST(c.n AS HUGEINT) * 1000000 // t.outn AS BIGINT) AS p_ppm
      |FROM c JOIN t USING (cur)""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val evt = table(s, dir, "events")
    val e = evt.select(col("user_id"), col("event_id"),
      graft.core.Graft.tsUs(evt).as("us"), col("event_type"))
    val c = e
      .select(col("event_type").as("cur"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id")))
          .as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the out-degree rollup and the join
    val t = c.groupBy(col("cur")).agg(sum(col("n")).as("outn"))
    c.join(broadcast(t), "cur")
      // widened multiply: a head transition's count at corpus scale can
      // push n*1e6 past a Long (the q173 convention)
      .select(col("cur"), col("nxt"), col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div outn AS BIGINT)")
          .as("p_ppm"))
  }

  /** TWO-STEP transition probabilities — q189's Markov matrix SQUARED
    * (P² in integer ppm): where will a user be two events from now.
    * The matrix product is one equi join on the middle state plus a
    * grouped sum — |types|³ multiply-adds over a model-sized input,
    * nothing event-scale after q189's front half. Floor-ppm products
    * compose exactly on both engines (Σ aₚₚₘ·bₚₚₘ div 10⁶); row sums
    * drift below 10⁶ only by the floor remainders, as a fixed-point
    * matrix should.
    */
  val q205Markov2Step = Q.checked(
    "q205_markov_2step",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
      |p AS (
      |  SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
      |  FROM e),
      |c AS (SELECT cur, nxt, count(*) AS n FROM p WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS outn FROM c GROUP BY cur),
      |m AS (SELECT c.cur, c.nxt,
      |  CAST(CAST(c.n AS HUGEINT) * 1000000 // t.outn AS BIGINT) AS ppm
      |  FROM c JOIN t USING (cur))
      |SELECT a.cur, b.nxt, CAST(sum(a.ppm * b.ppm) // 1000000 AS BIGINT) AS p2_ppm
      |FROM m a JOIN m b ON b.cur = a.nxt
      |GROUP BY a.cur, b.nxt""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val evt = table(s, dir, "events")
    val e = evt.select(col("user_id"), col("event_id"),
      graft.core.Graft.tsUs(evt).as("us"), col("event_type"))
    val c = e
      .select(col("event_type").as("cur"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id")))
          .as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the out-degree rollup and the matrix
    val t = c.groupBy(col("cur")).agg(sum(col("n")).as("outn"))
    val m = c.join(broadcast(t), "cur")
      .select(col("cur"), col("nxt"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div outn AS BIGINT)")
          .as("ppm"))
      .localCheckpoint(true) // both sides of the matrix product
    m.select(col("cur"), col("nxt").as("mid"), col("ppm").as("appm"))
      .join(m.select(col("cur").as("mid"), col("nxt"), col("ppm").as("bppm")), "mid")
      .groupBy(col("cur"), col("nxt"))
      .agg(expr("sum(appm * bppm) div 1000000").as("p2_ppm"))
  }

  /** CUSUM CHANGE-POINT DETECTION over the per-type daily series — the
    * drift alarm a pipeline monitor raises when a metric's LEVEL shifts
    * (q151's EWMA flags spikes; CUSUM integrates, so it catches slow
    * drifts EWMA smooths over). Everything is exact integers: daily
    * totals sum in DECIMAL then scale to micros; the Brownian-bridge
    * statistic is cleared of its divisions — C_t = n·Σᵢ≤ₜxᵢ − t·S (n
    * times the centered prefix sum) — and the alarm compare
    * C_t²·n > h²·(n·Sq − S²)·t·(n−t) (h = 2) multiplies both sides out
    * in DECIMAL(38,0)/HUGEINT, so no variance, square root, or float
    * ever materializes. Event-scale collapses to the (type × day) grid
    * map-side first; the prefix window is per-type over a day-bounded
    * series (model-sized), and the 5-row stats table broadcasts back.
    * The 38-digit bound holds to ~1e18 micros of daily volume per type —
    * beyond 100 TB; drop micros to whole units past that.
    */
  val q217CusumChangepoint = Q.checked(
    "q217_cusum_changepoint",
    """WITH d AS (
      |  SELECT event_type AS et, epoch_us(date_trunc('day', ts)) AS day_us,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 1000000 AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT et AS et2, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS s,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sq
      |  FROM d GROUP BY 1),
      |p AS (
      |  SELECT et, day_us,
      |    CAST(sum(x) OVER w AS HUGEINT) AS px,
      |    CAST(row_number() OVER w AS HUGEINT) AS t
      |  FROM d WINDOW w AS (PARTITION BY et ORDER BY day_us))
      |SELECT et AS event_type, day_us,
      |  CAST(n * px - t * s AS BIGINT) AS cusum_n,
      |  CAST(CASE WHEN (n*px - t*s) * (n*px - t*s) * n
      |                 > 4 * (n*sq - s*s) * t * (n - t)
      |            THEN 1 ELSE 0 END AS BIGINT) AS flag
      |FROM p JOIN st ON st.et2 = p.et""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType => DT}
    val d38 = DT(38, 0)
    val d = table(s, dir, "events")
      .groupBy(col("event_type").as("et"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg((sum(col("value").cast(DT(18, 4))) * 1000000).cast("long").as("x"))
    val st = d.groupBy(col("et").as("et2"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).cast(d38).as("s"),
        sum(col("x").cast(d38) * col("x").cast(d38)).cast(d38).as("sq"))
    val w = Window.partitionBy(col("et")).orderBy(col("day_us"))
    val p = d
      .withColumn("px", sum(col("x")).over(w).cast(d38))
      .withColumn("t", row_number().over(w).cast(d38))
    val c = col("n") * col("px") - col("t") * col("s")
    p.join(broadcast(st), col("et2") === col("et"))
      .select(col("et").as("event_type"), col("day_us"),
        c.cast("long").as("cusum_n"),
        when(c * c * col("n") >
            lit(4) * (col("n") * col("sq") - col("s") * col("s")) *
              col("t") * (col("n") - col("t")), 1L)
          .otherwise(0L).as("flag"))
  }

  /** TIME-WEIGHTED AVERAGE (TWAP) per user — the step-function mean
    * finance and sensor pipelines use when samples arrive irregularly
    * (an arithmetic mean over-weights bursts; TWAP weights each value by
    * how long it HELD): Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first), the value
    * held until the next observation. Exact integers end to end: values
    * in cents, durations in epoch-micros, the per-row product bounded by
    * cents·span < 2^63, the per-user sum accumulated in DECIMAL(38,0),
    * and the output ⌊10³·Σ/T⌋ in millicents by integer floor division.
    * The lead() window is per-user (bounded by one user's history);
    * single-observation users have T = 0 and emit NULL explicitly.
    */
  val q219Twap = Q.checked(
    "q219_twap",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v_c
      |  FROM events),
      |seg AS (
      |  SELECT user_id, us, v_c,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt
      |  FROM e),
      |a AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(sum(CAST(v_c AS HUGEINT) * dt) AS HUGEINT) AS num,
      |    CAST(max(us) - min(us) AS HUGEINT) AS t
      |  FROM seg GROUP BY user_id)
      |SELECT user_id, n_events,
      |  CASE WHEN t = 0 THEN NULL
      |       ELSE CAST((1000 * num) // t AS BIGINT) END AS twap_millicents
      |FROM a""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType => DT}
    val d38 = DT(38, 0)
    val ev = table(s, dir, "events")
    val e = ev.select(col("user_id"), col("event_id"),
      graft.core.Graft.tsUs(ev).as("us"),
      round(col("value").cast("double") * 100).cast("long").as("v_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val seg = e.withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
    seg.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v_c").cast(d38) * col("dt")).cast(d38).as("num"),
        (max(col("us")) - min(col("us"))).cast(d38).as("t"))
      .select(col("user_id"), col("n_events"),
        when(col("t") === 0, lit(null))
          .otherwise(expr("CAST((1000 * num) DIV t AS BIGINT)"))
          .as("twap_millicents"))
  }

  /** INTERVAL UNION (merge-overlaps) per user — the coverage metric
    * behind uptime/engagement reporting: each event opens a 5-minute
    * activity interval, overlapping intervals merge, and the answer is
    * the EXACT covered time (double-counting overlaps is the classic
    * naive-sum bug). The sweep is the interval form of gaps-and-islands:
    * a new island starts where the interval's start exceeds the EXCLUSIVE
    * prefix max of interval ends (one per-user window), the island id is
    * the running count of such breaks (same window), and each island's
    * coverage is max(end) − min(start). Both windows are per-user —
    * bounded by one user's history, never global — and all arithmetic is
    * epoch-micros integers.
    */
  val q225IntervalUnion = Q.checked(
    "q225_interval_union",
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS st,
      |    epoch_us(ts) + 300000000 AS en
      |  FROM events),
      |b AS (
      |  SELECT user_id, event_id, st, en,
      |    CASE WHEN st > coalesce(max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, st, en,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
      |  FROM b),
      |m AS (
      |  SELECT user_id, isl, max(en) - min(st) AS cov, count(*) AS n
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_merged, CAST(sum(n) AS BIGINT) AS n_intervals,
      |  CAST(sum(cov) AS BIGINT) AS covered_us
      |FROM m GROUP BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = table(s, dir, "events")
    val iv = ev.select(col("user_id"), col("event_id"),
      graft.core.Graft.tsUs(ev).as("st"),
      (graft.core.Graft.tsUs(ev) + 300000000L).as("en"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = iv.withColumn("brk",
      when(col("st") > coalesce(max(col("en")).over(wPrev), lit(-1L)), 1L)
        .otherwise(0L))
    // both windows share the UNIQUE (st, event_id) order — a value-only
    // order would leave island assignment ambiguous within ties
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isl = b.withColumn("isl", sum(col("brk")).over(wRun).cast("long"))
    isl.groupBy(col("user_id"), col("isl"))
      .agg((max(col("en")) - min(col("st"))).as("cov"), count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_merged"), sum(col("n")).cast("long").as("n_intervals"),
        sum(col("cov")).cast("long").as("covered_us"))
  }

  /** BOUNCE RATE by landing event type — the engagement-quality readout
    * per session entry point: 30-minute-gap sessions, a session's
    * LANDING type, and the share that bounce (single-event sessions) in
    * exact ppm. The landing type costs nothing extra: the row that
    * opens a session (gap break in the unique (us, event_id) order) IS
    * its first event, so the marker row carries the landing type and no
    * arg_min/first_value pass ever runs. Two per-user windows (bounded
    * by one user's history), one session-keyed count, entry-type-scale
    * output.
    */
  val q232BounceRate = Q.checked(
    "q232_bounce_rate",
    """WITH us AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |marks AS (
      |  SELECT user_id, event_id, event_type, us,
      |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM us WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, event_type, new_s,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM marks),
      |n AS (SELECT user_id, sid, count(*) AS n_ev FROM sess GROUP BY 1, 2),
      |first AS (SELECT user_id, sid, event_type AS landing FROM sess WHERE new_s = 1)
      |SELECT landing, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
      |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS bounce_ppm
      |FROM first JOIN n USING (user_id, sid)
      |GROUP BY landing""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = table(s, dir, "events")
    val us = ev.select(col("user_id"), col("event_id"), col("event_type"),
      graft.core.Graft.tsUs(ev).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val marks = us.withColumn("new_s",
      when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
    val sess = marks.withColumn("sid",
      sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("long"))
    val n = sess.groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("n_ev"))
    val first = sess.filter(col("new_s") === 1)
      .select(col("user_id"), col("sid"), col("event_type").as("landing"))
    first.join(n, Seq("user_id", "sid"))
      .groupBy(col("landing"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).cast("long").as("n_bounce"))
      .select(col("landing"), col("n_sessions"), col("n_bounce"),
        expr("n_bounce * 1000000 DIV n_sessions").as("bounce_ppm"))
  }

  /** PEAK-DAY DETECTION — the local-maxima alarm an ops dashboard runs
    * over every metric series (which days spiked above BOTH neighbors?):
    * strict local maxima of the per-type daily counts via one lag and
    * one lead over a per-type window on the calendar-bounded day grid.
    * Integers end to end (counts, epoch-micros); series edges (no
    * neighbor) are by definition not peaks. Complements q217's CUSUM:
    * CUSUM catches sustained level SHIFTS, this catches one-day spikes.
    */
  val q242PeakDays = Q.checked(
    "q242_peak_days",
    """WITH d AS (
      |  SELECT event_type AS et, epoch_us(date_trunc('day', ts)) AS day_us,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT et, day_us, n,
      |    lag(n) OVER w AS pn, lead(n) OVER w AS nn
      |  FROM d WINDOW w AS (PARTITION BY et ORDER BY day_us))
      |SELECT et AS event_type, day_us, n
      |FROM x WHERE pn IS NOT NULL AND nn IS NOT NULL AND n > pn AND n > nn""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = table(s, dir, "events")
      .groupBy(col("event_type").as("et"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("et")).orderBy(col("day_us"))
    d.withColumn("pn", lag(col("n"), 1).over(w))
      .withColumn("nn", lead(col("n"), 1).over(w))
      .filter(col("pn").isNotNull && col("nn").isNotNull &&
        col("n") > col("pn") && col("n") > col("nn"))
      .select(col("et").as("event_type"), col("day_us"), col("n"))
  }

  /** BURSTINESS (inter-event gap CV²) per user — the behavioral feature
    * separating steady users from bursty ones (CV² ≈ 1 Poisson, > 1
    * bursty, < 1 regular), computed without a single float: gaps from
    * one per-user lead window, then CV² = var/mean² clears to the exact
    * integer ppm (n·Σg² − (Σg)²)·10⁶ / (Σg)² with the squares in
    * DECIMAL(38,0)/HUGEINT (Σg² over micros passes int64 fast). Users
    * with fewer than two gaps emit NULL explicitly.
    */
  val q243Burstiness = Q.checked(
    "q243_burstiness",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |g AS (
      |  SELECT user_id,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS gap
      |  FROM e),
      |st AS (
      |  SELECT user_id, count(gap) AS n,
      |    CAST(sum(CAST(gap AS HUGEINT)) AS HUGEINT) AS sg,
      |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sg2
      |  FROM g GROUP BY user_id)
      |SELECT user_id, n AS n_gaps,
      |  CASE WHEN n < 2 OR sg = 0 THEN NULL
      |       ELSE CAST((n * sg2 - sg * sg) * 1000000 // (sg * sg) AS BIGINT)
      |  END AS cv2_ppm
      |FROM st""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType => DT}
    val d38 = DT(38, 0)
    val ev = table(s, dir, "events")
    val e = ev.select(col("user_id"), col("event_id"),
      graft.core.Graft.tsUs(ev).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val g = e.withColumn("gap", lead(col("us"), 1).over(w) - col("us"))
    g.groupBy(col("user_id"))
      .agg(count(col("gap")).as("n"),
        sum(col("gap").cast(d38)).cast(d38).as("sg"),
        sum(col("gap").cast(d38) * col("gap").cast(d38)).cast(d38).as("sg2"))
      .select(col("user_id"), col("n").as("n_gaps"),
        when(col("n") < 2 || col("sg") === 0, lit(null))
          .otherwise(expr(
            "CAST((n * sg2 - sg * sg) * 1000000 DIV (sg * sg) AS BIGINT)"))
          .as("cv2_ppm"))
  }

  /** DIURNAL-PROFILE DISTANCE — which event types share a time-of-day
    * shape? The pairwise L1 (total-variation×2) distance between the
    * hour-of-day histograms of every type pair, kept EXACT by clearing
    * denominators: Σₕ |fₐ(h)·N_b − f_b(h)·N_a| · 10⁶ / (N_a·N_b) — the
    * abs of cross-multiplied integers, never a float share. The hour
    * histograms are 24-row-per-type model tables, so the pair join is
    * grid arithmetic; only the histogram build touches event scale
    * (one map-side-combined agg). The behavioral-clustering input for
    * "do clicks and purchases happen at the same hours".
    */
  val q246DiurnalDistance = Q.checked(
    "q246_diurnal_distance",
    """WITH h AS (
      |  SELECT event_type AS et, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS f
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT et, CAST(sum(f) AS BIGINT) AS n FROM h GROUP BY 1),
      |grid AS (
      |  SELECT a.et AS ta, b.et AS tb, coalesce(ha.f, 0) AS fa, coalesce(hb.f, 0) AS fb,
      |    a.n AS na, b.n AS nb, hrs.hr
      |  FROM n a JOIN n b ON a.et < b.et
      |  CROSS JOIN (SELECT DISTINCT hr FROM h) hrs
      |  LEFT JOIN h ha ON ha.et = a.et AND ha.hr = hrs.hr
      |  LEFT JOIN h hb ON hb.et = b.et AND hb.hr = hrs.hr)
      |SELECT ta, tb,
      |  CAST(CAST(sum(abs(fa * nb - fb * na)) AS HUGEINT) * 1000000
      |       // (CAST(max(na) AS HUGEINT) * max(nb)) AS BIGINT) AS l1_ppm
      |FROM grid GROUP BY ta, tb""") { (s, dir) =>
    import org.apache.spark.sql.types.{DecimalType => DT}
    val h = table(s, dir, "events")
      .groupBy(col("event_type").as("et"), hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("f"))
      .localCheckpoint(true) // 24×|types| model table; feeds totals + grid
    val n = h.groupBy(col("et")).agg(sum(col("f")).cast("long").as("n"))
    val hrs = h.select(col("hr")).distinct()
    val grid = n.select(col("et").as("ta"), col("n").as("na"))
      .join(n.select(col("et").as("tb"), col("n").as("nb")), col("ta") < col("tb"))
      .crossJoin(broadcast(hrs))
      .join(h.select(col("et").as("ta"), col("hr"), col("f").as("fa")),
        Seq("ta", "hr"), "left")
      .join(h.select(col("et").as("tb"), col("hr"), col("f").as("fb")),
        Seq("tb", "hr"), "left")
      .na.fill(0L, Seq("fa", "fb"))
    grid.groupBy(col("ta"), col("tb"))
      .agg(sum(abs(col("fa") * col("nb") - col("fb") * col("na"))).cast(DT(38, 0))
          .as("s"),
        max(col("na")).as("mna"), max(col("nb")).as("mnb"))
      .select(col("ta"), col("tb"),
        expr("CAST(s * 1000000 DIV (CAST(mna AS DECIMAL(38,0)) * mnb) AS BIGINT)")
          .as("l1_ppm"))
  }

  val all: Vector[Q] =
    Vector(q66StreamApiSort, q68Sessionize, q92StreamCli, q93StreamPipeline,
      q95StreamHistogram, q112StreamSeqfile, q113StreamSeqfileOut,
      q122IngestDedup, q148Conversations, q157EventPaths,
      q189TransitionMatrix, q205Markov2Step, q217CusumChangepoint, q219Twap,
      q225IntervalUnion, q232BounceRate, q242PeakDays, q243Burstiness,
      q246DiurnalDistance)
}
