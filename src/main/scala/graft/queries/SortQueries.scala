package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.operators.{FieldSelection, KeyFieldSpec, SecondarySort, SortValidate}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sorts + the two text DSLs (SURVEY §2.6, §2.2): global total-order sort
  * with the SortValidator invariant, the secondary-sort contract, key-field
  * sort spec, and field-selection projection.
  */
object SortQueries {

  /** Global total-order sort over events by (ts, event_id) with the
    * SortValidator check (`SortValidator.java:97`): output row count, xor
    * of portable record hashes, and a global-sortedness flag — the
    * TeraSort/TeraValidate stand-in on the driver tables.
    */
  val q30SortValidate = Q.checked(
    "q30_sort_validate",
    """SELECT count(*) AS total_rows,
      |       bit_xor(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT) AS xor_hash,
      |       TRUE AS is_sorted
      |FROM events""") { (s, dir) =>
    val ev = table(s, dir, "events")
    SortValidate.sortAndValidate(
      s, ev,
      sortKey = graft.core.Graft.tsUs(ev),
      tieBreak = col("event_id"),
      recHash = SortValidate.recordHash(col("event_id")))
  }

  /** Secondary sort (`SecondarySort.java:57-224`): group events by user,
    * values iterated in (ts, event_id) order — the literal
    * reduce(key, sortedValues) contract via repartition +
    * sortWithinPartitions + streaming group fold.
    */
  val q31SecondarySort = Q.checked(
    "q31_secondary_sort",
    """SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
      |FROM events GROUP BY user_id""") { (s, dir) =>
    val ev = table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    import s.implicits._
    SecondarySort.sortedGroups[(Long, String)](
      ev, col("user_id"), Seq(col("ts"), col("event_id")))(
      _.getLong(0)) { (k, rows) =>
      val sb = new StringBuilder
      for (r <- rows) {
        if (sb.nonEmpty) sb.append(',')
        sb.append(r.getString(3))
      }
      (k.asInstanceOf[Long], sb.toString)
    }.toDF("user_id", "seq")
  }

  /** Key-field sort spec (`KeyFieldHelper.java:23-39`): supplier rows as
    * tab-separated lines sorted by `-k3n -k1r` (numeric field 3 asc,
    * field 1 desc), top 50 ranks encoded WindowGroupLimit-style.
    */
  val q32KeyFieldSort = Q.checked(
    "q32_keyfield_sort",
    """WITH lines AS (
      |  SELECT s_name || chr(9) || CAST(s_suppkey AS VARCHAR) || chr(9) || CAST(s_nationkey AS VARCHAR) AS line
      |  FROM supplier
      |)
      |SELECT line, rank FROM (
      |  SELECT line, row_number() OVER (ORDER BY
      |    coalesce(nullif(regexp_extract(split_part(line, chr(9), 3), '^[ \t]*([-+]?\d*\.?\d+)', 1), '')::DOUBLE, 0) ASC,
      |    split_part(line, chr(9), 1) DESC,
      |    line) AS rank
      |  FROM lines
      |) WHERE rank <= 50""") { (s, dir) =>
    val lines = table(s, dir, "supplier")
      .select(concat_ws("\t", col("s_name"), col("s_suppkey"), col("s_nationkey")).as("line"))
    val keys = KeyFieldSpec.sortColumns(col("line"), "\t", "-k3n -k1r") :+ col("line").asc
    lines
      .withColumn("rank", row_number().over(Window.orderBy(keys: _*)))
      .filter(col("rank") <= 50) // direct rank filter → InferWindowGroupLimit
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Field-selection DSL (`FieldSelectionHelper.java:60-79`): customer rows
    * as ':'-separated records, spec `"2,0:3-"` → key = fields 2,0; value =
    * fields 3..end.
    */
  val q33FieldSel = Q.checked(
    "q33_fieldsel",
    """WITH recs AS (
      |  SELECT CAST(c_custkey AS VARCHAR) || ':' || c_name || ':' || c_mktsegment || ':' ||
      |         CAST(c_nationkey AS VARCHAR) || ':' || c_name AS line
      |  FROM customer
      |)
      |SELECT split_part(line, ':', 3) || ':' || split_part(line, ':', 1) AS key,
      |       split_part(line, ':', 4) || ':' || split_part(line, ':', 5) AS value
      |FROM recs""") { (s, dir) =>
    val recs = table(s, dir, "customer")
      .select(concat_ws(":",
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"), col("c_name")).as("line"))
    val (k, v) = FieldSelection.project(col("line"), ":", "2,0:3-")
    recs.select(k.as("key"), v.as("value"))
  }

  /** Partitioned analytic window (the scale-safe window shape: state per
    * user, never a global partition): running event count and lag of the
    * previous event type, ordered by (ts, event_id) within each user.
    * Exact: the running value is a count (integers), lag is a string.
    */
  val q36WindowRunning = Q.checked(
    "q36_window_running",
    """SELECT event_id, user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS seq_no,
      |  count(*) OVER w AS running_n,
      |  lag(event_type, 1) OVER w AS prev_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("seq_no"),
        count(lit(1)).over(w).as("running_n"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
  }

  /** Rollup — a Catalyst free win the reference cannot express (SURVEY
    * §2.4: "no grouping sets / cube / rollup anywhere"): subtotal rows per
    * (returnflag), (returnflag, linestatus), and grand total in one pass.
    */
  val q37Rollup = Q.checked(
    "q37_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""") { (s, dir) =>
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
  }

  /** Key-field partition routing (`KeyFieldBasedPartitioner.java:53-56`):
    * rows route to reducers by the hash of the selected key fields. The
    * routing function is the engine-portable hash, so the oracle verifies
    * the exact bucket placement every row would get on any cluster size.
    */
  val q38KeyFieldPartition = Q.checked(
    "q38_keyfield_partition",
    """WITH lines AS (
      |  SELECT s_name || chr(9) || CAST(s_suppkey AS VARCHAR) || chr(9) || CAST(s_nationkey AS VARCHAR) AS line
      |  FROM supplier
      |)
      |SELECT ('0x' || substring(md5(split_part(line, chr(9), 3)), 1, 8))::BIGINT % 4 AS route,
      |       count(*) AS n, min(line) AS min_line
      |FROM lines GROUP BY route""") { (s, dir) =>
    import graft.functions.Hashing
    val lines = table(s, dir, "supplier")
      .select(concat_ws("\t", col("s_name"), col("s_suppkey"), col("s_nationkey")).as("line"))
    val key = KeyFieldSpec.partitionColumns(col("line"), "\t", "-k3").head
    lines
      .repartition(4, Hashing.hash32(key) % 4) // the physical routing
      .groupBy((Hashing.hash32(key) % 4).as("route"))
      .agg(count(lit(1)).as("n"), min(col("line")).as("min_line"))
  }

  /** The navigation-window family over the event stream: lag (gap to the
    * previous event), lead (the next event's type), first_value (the
    * user's first-seen instant) and row_number, all over ONE per-user
    * window — Spark plans a single partitioned WindowExec, one shuffle on
    * user_id, per-group linear state. Every output is integral or string
    * (epoch-micros deltas, no floats), so the cross-engine compare is
    * exact; (user, us) — the TRUNCATED micros key — is tie-free at every SF, making lag/lead order
    * deterministic.
    */
  val q81WindowFamily = Q.checked(
    "q81_window_family",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events)
      |SELECT event_id, user_id,
      |  us - lag(us) OVER w AS gap_us,
      |  lead(event_type) OVER w AS next_type,
      |  first_value(us) OVER w AS first_us,
      |  row_number() OVER w AS seq
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val ev = table(s, dir, "events")
    ev
      .select(col("event_id"), col("user_id"),
        graft.core.Graft.tsUs(ev).as("us"), col("event_type"))
      .select(col("event_id"), col("user_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("us")).over(w).as("first_us"),
        row_number().over(w).as("seq"))
  }

  /** Z-order (Morton) clustering key ([[graft.operators.ZOrder]]): the
    * multi-dimensional layout pass — interleave (user_id, event_id) bits
    * and aggregate the curve per bucket. The oracle replays the full
    * bit-shuffle expression (generated from the same helper), so a green
    * row pins the interleave math bit for bit; ZOrderSpec separately
    * proves the LAYOUT property (a z-range-partitioned table bounds
    * partition envelopes in BOTH dimensions, so 2-D box predicates prune
    * where a linear sort cannot).
    */
  val q126Zorder = Q.checked(
    "q126_zorder",
    s"""WITH z AS (
       |  SELECT ${graft.operators.ZOrder.zValueSql("user_id", "event_id", 16)} AS zv
       |  FROM events)
       |SELECT zv >> 18 AS z_bucket, count(*) AS n,
       |  min(zv) AS min_z, max(zv) AS max_z
       |FROM z GROUP BY 1""") { (s, dir) =>
    table(s, dir, "events")
      .select(graft.operators.ZOrder
        .zValue(col("user_id"), col("event_id"), 16).as("zv"))
      .groupBy(shiftright(col("zv"), 18).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zv")).as("min_z"), max(col("zv")).as("max_z"))
  }

  /** Time-RANGE window frame — the member of the window family q81's
    * ROWS frames can't express: each event's trailing-1-hour activity
    * (count + exact scaled-long value sum) over the SAME user, where the
    * frame boundary is an event-TIME interval, not a row count — burst
    * detection at the event grain (the q151 daily EWMA's intra-day
    * sibling). Tied timestamps fall inside each other's frames by RANGE
    * semantics, so the result is deterministic without a tiebreak; one
    * partitioned WindowExec, one shuffle on user_id, per-group linear
    * state (never a global window).
    */
  val q159RangeFrame = Q.checked(
    "q159_range_frame",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events)
      |SELECT event_id, user_id, us,
      |  count(*) OVER w AS n_1h,
      |  CAST(sum(v) OVER w AS BIGINT) AS sum_1h
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""") { (s, dir) =>
    val ev = table(s, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    ev
      .select(col("event_id"), col("user_id"),
        graft.core.Graft.tsUs(ev).as("us"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
      .select(col("event_id"), col("user_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("v")).over(w).as("sum_1h"))
  }

  /** Group top-k WITH ties — dense_rank ≤ k, the leaderboard semantics
    * q102's row_number cap deliberately lacks: every document tied at a
    * qualifying length ranks, so the per-source result can exceed k rows
    * and no tied doc is arbitrarily dropped. Spark's WindowGroupLimit
    * prunes dense_rank limits map-side exactly like row_number ones, so
    * the shuffle still carries ≈ k-ish rows per source at any scale.
    */
  val q163TopTies = Q.checked(
    "q163_top_ties",
    """SELECT doc_id, source, n_chars, CAST(dr AS BIGINT) AS dr FROM (
      |  SELECT doc_id, source, n_chars,
      |    dense_rank() OVER (PARTITION BY source ORDER BY n_chars DESC) AS dr
      |  FROM documents) WHERE dr <= 3""") { (s, dir) =>
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc)
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("dr") <= 3)
  }

  /** EQUI-DEPTH (ntile) BINNING over the full price distribution without
    * the textbook `ntile(k) OVER (ORDER BY …)` — a global window is a
    * single-partition sort of the whole fact table, the one-task cliff.
    * [[graft.operators.Packing.globalRank]] assigns the global rank by the
    * two-pass distributed prefix sum (range-partition on the sort key, one
    * row count per partition to the driver), and ANSI ntile is then pure
    * per-row arithmetic on (rank, n): the first n%k buckets take
    * ceil(n/k) rows, the rest floor(n/k) — integer-exact in both engines.
    * Output is k boundary rows (count + min/max cents per bucket): the
    * equi-depth histogram a lakehouse publishes as quantile statistics.
    * The order must be total, so (price, orderkey, linenumber) carries a
    * unique tiebreak.
    */
  val q211EquidepthBins = Q.checked(
    "q211_equidepth_bins",
    """WITH v AS (
      |  SELECT CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS c,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |b AS (
      |  SELECT c, ntile(16) OVER (ORDER BY c, l_orderkey, l_linenumber) AS bucket
      |  FROM v)
      |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
      |  min(c) AS min_c, max(c) AS max_c
      |FROM b GROUP BY 1""") { (s, dir) =>
    import graft.operators.Packing
    val k = 16
    val v = table(s, dir, "lineitem")
      .select(round(col("l_extendedprice").cast("double") * 100).cast("long").as("c"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = Packing.globalRank(v, Seq("c", "l_orderkey", "l_linenumber"))
    val t = ranked.agg(count(lit(1)).as("n_total"))
    // ANSI ntile from (1-based rank r, n): q = n div k, m = n mod k,
    // cut = (q+1)*m; bucket = r <= cut ? (r-1) div (q+1) + 1
    //                                  : m + (r-cut-1) div q + 1
    ranked.crossJoin(broadcast(t))
      .select(col("c"),
        (col("rank") + 1).as("r"),
        expr(s"n_total DIV $k").as("q"),
        (col("n_total") % k).as("m"))
      .withColumn("cut", (col("q") + 1) * col("m"))
      .withColumn("bucket",
        expr("CASE WHEN r <= cut THEN (r - 1) DIV (q + 1) + 1" +
          " ELSE m + (r - cut - 1) DIV q + 1 END"))
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("min_c"), max(col("c")).as("max_c"))
  }

  /** SKYLINE / PARETO FRONT — the multi-objective dominance query (find
    * the parts no other part beats on BOTH total quantity and total
    * revenue): p is dominated iff some q has qx ≥ px ∧ qy ≥ py with one
    * strict. The naive formulation is an O(n²) self-join; the 2-D
    * structure collapses it to TWO distributed prefix passes: a point
    * survives iff (a) it carries its x-group's max y, and (b) that y
    * strictly beats the EXCLUSIVE prefix max of y over all greater x —
    * [[graft.operators.Packing.runningMax]] over the x-descending
    * distinct-x table (one partial max per partition to the driver,
    * never a window, never n²). The oracle IS the quadratic NOT EXISTS
    * dominance join — two algorithms, one answer. Ties kept correctly:
    * identical (x, y) points do not dominate each other and all survive.
    */
  val q222Skyline = Q.checked(
    "q222_skyline",
    """WITH r AS (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x,
      |    CAST(sum(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1)
      |SELECT pk, x, y FROM r p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM r q
      |  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))""") { (s, dir) =>
    import graft.operators.Packing
    val r = table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(round(col("l_quantity")).cast("long")).cast("long").as("x"),
        sum(round(col("l_extendedprice").cast("double") * 100).cast("long"))
          .cast("long").as("y"))
    val perx = r.groupBy(col("x").as("gx")).agg(max(col("y")).as("maxy"))
      .withColumn("negx", -col("gx"))
    val ranked = Packing.runningMax(perx, Seq("negx"), "maxy")
      .select(col("gx"), col("maxy"), col("cummax_excl"))
    r.join(ranked, col("x") === col("gx"))
      .filter(col("y") === col("maxy") &&
        (col("cummax_excl").isNull || col("y") > col("cummax_excl")))
      .select(col("pk"), col("x"), col("y"))
  }

  val all: Vector[Q] =
    Vector(q30SortValidate, q31SecondarySort, q32KeyFieldSort, q33FieldSel,
      q36WindowRunning, q37Rollup, q38KeyFieldPartition, q81WindowFamily,
      q126Zorder, q159RangeFrame, q163TopTies, q211EquidepthBins, q222Skyline)
}
