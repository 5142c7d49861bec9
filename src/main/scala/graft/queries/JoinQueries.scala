package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The join surface (SURVEY §2.3): composite inner/outer/override
  * (`src/mapred/org/apache/hadoop/mapred/join/` — TestDatamerge semantics),
  * the reduce-side tagged join (`src/contrib/data_join/.../DataJoinReducerBase.java:237`),
  * the broadcast DistributedCache pattern, and semi/anti derivations.
  *
  * Scale notes: dimension sides (nation, region) sit far under the 64 MB
  * broadcast threshold so Catalyst plans BroadcastHashJoin — no shuffle of
  * the fact side. The orders⋈lineitem tagged join is the genuine large-large
  * case: both sides shuffle on the join key once (SMJ), AQE handles skew.
  */
object JoinQueries {

  private val D = DecimalType(18, 4)

  /** Inner composite: customer ⋈ nation (broadcast dim) ⋈ orders (fact).
    * Duplicate keys on the orders side exercise the per-key cross product
    * (`CompositeRecordReader.JoinCollector`).
    */
  val q10JoinInner = Q.checked(
    "q10_join_inner",
    """SELECT o.o_orderkey, c.c_name, n.n_name, o.o_totalprice
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey""") { (s, dir) =>
    val c = table(s, dir, "customer")
    val n = broadcast(table(s, dir, "nation"))
    val o = table(s, dir, "orders")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_name"), n("n_name"), o("o_totalprice"))
  }

  /** Outer composite over two sources with keys missing on BOTH sides
    * (customers filtered by acctbal vs order-count aggregate): per-source
    * null ⇔ absent, the TupleWritable presence bitmask re-expressed.
    */
  val q11JoinOuter = Q.checked(
    "q11_join_outer",
    """WITH a AS (SELECT c_custkey AS k, c_name AS v FROM customer WHERE c_acctbal > 0),
      |     b AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY o_custkey)
      |SELECT coalesce(a.k, b.k) AS k, a.v AS name, b.cnt AS cnt
      |FROM a FULL OUTER JOIN b ON a.k = b.k""") { (s, dir) =>
    val a = Joins.source(
      table(s, dir, "customer").filter(col("c_acctbal") > 0),
      col("c_custkey"), col("c_name"))
    val b = Joins.source(
      table(s, dir, "orders").groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt")),
      col("o_custkey"), col("cnt"))
    Joins.outer(a, b)
      .select(col("k"), col("v.v0").as("name"), col("v.v1").as("cnt"))
  }

  /** Override composite via the expression DSL — rightmost source holding
    * the key wins (`OverrideRecordReader.java:36`). Three nation-keyed
    * sources with different coverage.
    */
  val q12JoinOverride = Q.checked(
    "q12_join_override",
    """WITH s1 AS (SELECT n_nationkey AS k, n_name AS v FROM nation),
      |     s2 AS (SELECT n_nationkey AS k, upper(n_name) AS v FROM nation WHERE n_regionkey < 3),
      |     s3 AS (SELECT n_nationkey AS k, 'X' || n_name AS v FROM nation WHERE n_nationkey % 5 = 0)
      |SELECT coalesce(s1.k, s2.k, s3.k) AS k,
      |       coalesce(s3.v, s2.v, s1.v) AS v
      |FROM s1
      |FULL OUTER JOIN s2 ON s1.k = s2.k
      |FULL OUTER JOIN s3 ON coalesce(s1.k, s2.k) = s3.k""") { (s, dir) =>
    val nation = table(s, dir, "nation")
    val sources = Map(
      "s1" -> Joins.source(nation, col("n_nationkey"), col("n_name")),
      "s2" -> Joins.source(nation.filter(col("n_regionkey") < 3),
        col("n_nationkey"), upper(col("n_name"))),
      "s3" -> Joins.source(nation.filter(col("n_nationkey") % 5 === 0),
        col("n_nationkey"), concat(lit("X"), col("n_name"))))
    Joins.run("override(tbl(s1),tbl(s2),tbl(s3))", sources)
      .select(col("k").cast("int").as("k"), col("v"))
  }

  /** Reduce-side tagged join (data_join contrib): the large-large shuffle
    * join — orders ⋈ lineitem on orderkey, revenue per order priority.
    * DECIMAL internally, one rounded DOUBLE at the end (cross-engine exact).
    */
  val q13JoinTagged = Q.checked(
    "q13_join_tagged",
    """SELECT o.o_orderpriority,
      |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority""") { (s, dir) =>
    val o = table(s, dir, "orders")
    val l = table(s, dir, "lineitem")
    o.join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Semi/anti join (SURVEY §2.3 "approximable"): customers with vs without
    * orders, via Spark's native left_semi / left_anti (no right columns, no
    * duplicate explosion).
    */
  val q14SemiAnti = Q.checked(
    "q14_semi_anti",
    """SELECT
      |  (SELECT count(*) FROM customer c WHERE EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with,
      |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without""") { (s, dir) =>
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_without"))
    withO.crossJoin(withoutO)
  }

  /** The map-side merge-join framework proper (`mapred.join`, SURVEY §2.3
    * row 1): identically-partitioned, same-sorted sources joined WITHOUT a
    * shuffle = Spark bucketed tables + sort-merge join. Both sides are
    * written `bucketBy(8, key).sortBy(key)` (the reference's
    * partitioned+sorted SequenceFile layout contract) and joined on the
    * bucket key; ScaleSpec asserts the no-Exchange plan for this layout,
    * this row proves the RESULT against the oracle.
    */
  val q67BucketedJoin = Q.checked(
    "q67_bucketed_join",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""") { (s, dir) =>
    def tmp(n: String) = graft.core.Graft.scratch(n)
    s.sql("DROP TABLE IF EXISTS g_orders_bkt")
    s.sql("DROP TABLE IF EXISTS g_customer_bkt")
    table(s, dir, "orders")
      .write.mode("overwrite").option("path", tmp("bkt-orders"))
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("g_orders_bkt")
    table(s, dir, "customer")
      .write.mode("overwrite").option("path", tmp("bkt-customer"))
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("g_customer_bkt")
    s.table("g_orders_bkt")
      .join(s.table("g_customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast(D)), 2).cast("double").as("total"))
  }

  /** Point-in-time (as-of) join: each error event looks up the same
    * user's most recent click at or before it. Spark has no native ASOF
    * operator; [[graft.operators.TemporalJoins.asOf]] builds it as a
    * tagged union + one partitioned running-last window — one shuffle,
    * |L|+|R| rows, no inequality-join explosion. The oracle is DuckDB's
    * native ASOF JOIN — an independent implementation of the semantics.
    * Both engines compare on epoch MICROS ([[graft.core.Graft.tsUs]]
    * normalizes whichever fixture schema ships; DuckDB side: epoch_us).
    *
    * DATA INVARIANT the hash compare rests on: clicks are tie-free per
    * (user_id, us). DuckDB's ASOF pick among equal-timestamp matches is
    * unspecified while ours is deterministic (struct max), so a corpus
    * with ties could hash-diverge; TemporalJoinsSpec asserts tie-freedom
    * on every fixture so a data-gen change fails loudly there instead.
    */
  val q69AsofJoin = Q.checked(
    "q69_asof_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events)
      |SELECT l.event_id, l.user_id, l.us AS err_us,
      |       r.event_id AS click_id, r.us AS click_us
      |FROM (SELECT * FROM e WHERE event_type = 'error') l
      |ASOF JOIN (SELECT * FROM e WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id AND l.us >= r.us""") { (s, dir) =>
    import graft.operators.TemporalJoins
    val evRaw = table(s, dir, "events")
    val ev = evRaw
      .select(col("event_id"), col("user_id"),
        graft.core.Graft.tsUs(evRaw).as("us"), col("event_type"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us").as("err_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cuid"),
        col("us").as("click_us"))
    TemporalJoins.asOf(
      errors, col("user_id"), col("err_us"),
      clicks, col("cuid"), col("click_us"))
      .filter(col("matched").isNotNull) // inner, like the oracle's ASOF JOIN
      .select(col("event_id"), col("user_id"), col("err_us"),
        col("matched.click_id").as("click_id"),
        col("matched.click_us").as("click_us"))
  }

  /** Bounded-gap range join: same-user event pairs at most one hour
    * apart, ordered a-before-b. The Spark plan is a bucketed band join
    * ([[graft.operators.TemporalJoins.withinGap]]): equi-join on
    * (user, hour-bucket) with the right side exploded to its two
    * candidate buckets — never a cartesian or raw inequality join. The
    * oracle runs DuckDB's native inequality join (IEJoin), again an
    * independent implementation.
    */
  val q80RangeJoin = Q.checked(
    "q80_range_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
      |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      |       b.us - a.us AS gap_us
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND b.us > a.us
      | AND b.us - a.us <= 3600000000""") { (s, dir) =>
    import graft.operators.TemporalJoins
    val evRaw = table(s, dir, "events")
    val ev = evRaw
      .select(col("event_id"), col("user_id"), graft.core.Graft.tsUs(evRaw).as("us"))
    TemporalJoins.withinGap(
      ev, col("user_id"), col("us"),
      ev, col("user_id"), col("us"),
      gap = 3600000000L)
      .select(col("a.user_id").as("user_id"), col("a.event_id").as("a_id"),
        col("b.event_id").as("b_id"), col("gap_").as("gap_us"))
  }

  /** Bloom-prefiltered semi-join, end-to-end: orders are pruned by a
    * broadcast Bloom filter built from high-balance customers BEFORE the
    * exact semi-join, then aggregated. The sketch's false positives are
    * removed by the exact join, so the result equals a plain semi-join —
    * which is exactly what the oracle runs (sketch bits are
    * implementation-specific; the EQUIVALENCE is the cross-engine
    * contract). At 100 TB the few-MB filter prunes the fact scan before
    * any shuffle; SketchesSpec separately proves no true match is ever
    * dropped.
    */
  val q63cBloomSemi = Q.checked(
    "q63c_bloom_semi",
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM rich r WHERE r.c_custkey = o.o_custkey)
      |GROUP BY o_orderstatus""") { (s, dir) =>
    import graft.operators.Sketches
    val rich = table(s, dir, "customer")
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val pruned = Sketches.bloomSemiFilter(
      table(s, dir, "orders"), col("o_custkey"),
      rich, "c_custkey", expectedItems = 100000L)
    pruned.join(rich, pruned("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast(D)), 2).cast("double").as("total"))
  }

  /** Salted skew-join parity ([[graft.operators.Salt.saltedJoin]],
    * data-derived-salt variant): the lineitem⋈orders large-large join run
    * through the 8-lane salted path, then aggregated. The oracle is the
    * PLAIN join — a green hash proves salting is invisible to join
    * semantics (the whole point of the pattern: spread a hot key across
    * lanes without changing one output bit). l_linenumber varies within
    * l_orderkey, so each hot order's rows really do fan across lanes
    * rather than re-colliding on one.
    */
  val q107SaltedJoin = Q.checked(
    "q107_salted_join",
    """SELECT o.o_orderpriority,
      |  count(*) AS n_items,
      |  CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority""") { (s, dir) =>
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    val ord = table(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    graft.operators.Salt.saltedJoin(li, ord, Seq("k"), 8, col("l_linenumber"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity").cast(D)), 2).cast("double").as("sum_qty"))
  }

  /** Six-table star-join analytics (the TPC-H Q5 "local supplier volume"
    * shape): region → nation → customer → orders → lineitem → supplier,
    * with the supplier join requiring s_nationkey = c_nationkey (revenue
    * only counts when the supplier sits in the customer's nation — the
    * composite-key join that makes Q5 the classic join-order benchmark),
    * finished orders only, revenue = Σ extprice·(1−discount) in EXACT
    * decimal, rounded once at the end (the q20 discipline).
    *
    * Scale shape: region/nation/supplier ride broadcasts (Catalyst picks
    * them under the threshold; at 100 TB supplier may graduate to a
    * shuffle join on (suppkey, nationkey) — the plan degrades safely
    * because the join is declarative), customer⋈orders and
    * orders⋈lineitem shuffle on their natural keys, and AQE handles the
    * orderkey skew. One aggregation at (region, nation) granularity —
    * 25-row output from a lineitem-scale probe.
    */
  val q149StarJoin = Q.checked(
    "q149_star_join",
    """SELECT r_name, n_name, count(*) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY r_name, n_name""") { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    table(s, dir, "region")
      .join(table(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
      .join(table(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
      .join(table(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("o_custkey") === col("c_custkey"))
      .join(table(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(table(s, dir, "supplier"),
        col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 4)))), 2)
          .cast("double").as("revenue"))
  }

  /** Last-touch attribution — q69's as-of join doing its production job:
    * every purchase is attributed to the user's most recent click/view
    * at-or-before it ([[graft.operators.TemporalJoins.asOf]] — one
    * tagged union + one per-user running-last window, never an
    * inequality join), then the match is discarded if it is older than
    * the 1-day attribution window (post-filtering the LAST touch is
    * equivalent to a bounded match: if the most recent touch is outside
    * the window, every touch is). Same-instant touches attribute
    * (refs order before probes); touch-vs-touch timestamp ties resolve
    * to the highest event_id on both engines. Output: purchases and
    * exact scaled revenue per attributed touch type, plus the
    * `unattributed` bucket.
    */
  val q161Attribution = Q.checked(
    "q161_attribution",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events),
      |p AS (SELECT event_id, user_id, us, v FROM e WHERE event_type = 'purchase'),
      |t AS (SELECT event_id, user_id, us, event_type FROM e
      |      WHERE event_type IN ('click', 'view')),
      |m AS (
      |  SELECT p.event_id, p.v,
      |    (SELECT t.event_type FROM t
      |     WHERE t.user_id = p.user_id AND t.us <= p.us
      |       AND p.us - t.us <= 86400000000
      |     ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS src
      |  FROM p)
      |SELECT COALESCE(src, 'unattributed') AS touch,
      |  count(*) AS purchases, CAST(sum(v) AS BIGINT) AS revenue_scaled
      |FROM m GROUP BY 1""") { (s, dir) =>
    import graft.operators.TemporalJoins
    val evt = table(s, dir, "events")
    val e = evt.select(col("event_id"), col("user_id"),
      graft.core.Graft.tsUs(evt).as("us"), col("event_type"),
      round(col("value").cast("double") * 1000000d).cast("long").as("v"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("v"))
    val t = e.filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), col("us"), col("event_type"))
    TemporalJoins.asOf(p, col("user_id"), col("us"),
        t, col("user_id"), col("us"))
      .select(
        when(col("matched").isNotNull &&
            col("us") - col("matched.us") <= 86400000000L,
          col("matched.event_type")).otherwise("unattributed").as("touch"),
        col("v"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("purchases"), sum(col("v")).as("revenue_scaled"))
  }

  /** Dynamic partition pruning over a date-partitioned fact — THE scan
    * reducer for the 100 TB lakehouse layout (orders laid out
    * `.../mon=YYYYMM/` exactly like a production date-partitioned fact):
    * monthly order volume restricted to the months that saw a heavy
    * returned shipment. The month dim is derived at runtime from a
    * selective lineitem filter, so static partition pruning is
    * impossible — Spark's DPP instead builds the qualifying-month set
    * from the broadcast dim at execution time and skips every other
    * partition's files entirely (the fact scan shows
    * `dynamicpruningexpression` in PartitionFilters; PlanSpec asserts
    * it). The dim is explicitly broadcast: months are bounded by the
    * calendar, and `reuseBroadcastOnly` DPP then costs zero extra jobs —
    * the pruning subquery reuses the join's own broadcast exchange.
    *
    * The oracle replays the same join over the unpartitioned table —
    * green proves layout + pruning change nothing but the files read.
    */
  val q165DppPrune = Q.checked(
    "q165_dpp_prune",
    """WITH hot AS (
      |  SELECT DISTINCT year(l_shipdate)*100 + month(l_shipdate) AS mon
      |  FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 49),
      |f AS (
      |  SELECT year(o_orderdate)*100 + month(o_orderdate) AS mon, o_totalprice
      |  FROM orders)
      |SELECT f.mon, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      |FROM f JOIN hot ON f.mon = hot.mon
      |GROUP BY f.mon""") { (s, dir) =>
    val lake = graft.core.Graft.scratch("dpp-orders")
    table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"))
      .repartition(col("mon")) // one file per month partition
      .write.mode("overwrite").partitionBy("mon").parquet(lake)
    val fact = s.read.parquet(lake)
    val hot = table(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 49)
      .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("mon"))
      .distinct()
    fact.join(broadcast(hot), Seq("mon"))
      .groupBy(col("mon").cast("long").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(D)), 2).cast("double").as("total"))
  }

  /** Interval OVERLAP join ([[graft.operators.TemporalJoins.overlapJoin]])
    * — the ranges×ranges member of the temporal family (q69 point-in-time,
    * q80 point-gap): which per-user daily activity spans [first event,
    * last event] overlap a sampled error incident's ±30-minute window,
    * with the exact overlap duration. Engine plan: both interval sets
    * explode to their covered day-width buckets (spans ≤ 1, incident
    * windows ≤ 2), candidates meet by bucket equi-join, and the
    * canonical max(starts)-bucket rule emits each pair exactly once —
    * no distinct pass, no cartesian, no per-row inequality probe. The
    * oracle is DuckDB's native inequality (IEJoin) plan — an independent
    * implementation of the semantics, the q80 convention.
    */
  val q172OverlapJoin = Q.checked(
    "q172_overlap_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
      |spans AS (
      |  SELECT user_id, us // 86400000000 AS day, min(us) AS sa, max(us) AS ea
      |  FROM e GROUP BY user_id, us // 86400000000),
      |inc AS (
      |  SELECT event_id AS incident_id, us - 1800000000 AS sb, us + 1800000000 AS eb
      |  FROM e WHERE event_type = 'error' AND event_id % 50 = 0)
      |SELECT sp.user_id, sp.day, i.incident_id,
      |  least(sp.ea, i.eb) - greatest(sp.sa, i.sb) AS overlap_us
      |FROM spans sp JOIN inc i ON sp.sa <= i.eb AND i.sb <= sp.ea""") { (s, dir) =>
    import graft.operators.TemporalJoins
    val evt = table(s, dir, "events")
    val e = evt.select(col("event_id"), col("user_id"),
      graft.core.Graft.tsUs(evt).as("us"), col("event_type"))
    val spans = e
      .groupBy(col("user_id"), expr("us div 86400000000").as("day"))
      .agg(min(col("us")).as("sa"), max(col("us")).as("ea"))
    val inc = e
      .filter(col("event_type") === "error" && col("event_id") % 50 === 0)
      .select(col("event_id").as("incident_id"),
        (col("us") - 1800000000L).as("sb"), (col("us") + 1800000000L).as("eb"))
    TemporalJoins.overlapJoin(spans, col("sa"), col("ea"),
        inc, col("sb"), col("eb"), bucketUs = 86400000000L)
      .select(col("a.user_id").as("user_id"), col("a.day").as("day"),
        col("b.incident_id").as("incident_id"), col("overlap_").as("overlap_us"))
  }

  /** Slowly-changing-dimension TYPE 2 point-in-time join — the warehouse
    * pattern q69's as-of machinery exists for: a versioned dimension
    * (every 4th customer changes segment on 1998-01-01, synthesized by
    * seeded hash so the oracle replays it) joined to facts at the
    * version effective AT the order date — never the current version,
    * never an interval explosion. Engine plan: the dim versions are the
    * as-of reference stream keyed by (custkey, effective-from), orders
    * are probes, one tagged-union window ([[TemporalJoins.asOf]]) —
    * |facts| + |versions| rows, one shuffle. An order placed exactly at
    * the effective instant takes the NEW version (the `<=` as-of
    * convention, both engines). The oracle is DuckDB's native ASOF JOIN
    * — an independent implementation, the q69 convention. Output: order
    * volume and exact revenue per point-in-time segment.
    */
  val q181Scd2Join = Q.checked(
    "q181_scd2_join",
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment AS seg, CAST(0 AS BIGINT) AS eff_us FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'x' || c_mktsegment, epoch_us(TIMESTAMP '1998-01-01')
      |  FROM customer
      |  WHERE ('0x'||substring(md5('scd:'||CAST(c_custkey AS VARCHAR)),1,8))::BIGINT % 4 = 0),
      |o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS us, o_totalprice FROM orders)
      |SELECT d.seg, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      |FROM o ASOF JOIN dim d
      |  ON o.o_custkey = d.c_custkey AND o.us >= d.eff_us
      |GROUP BY d.seg""") { (s, dir) =>
    import graft.operators.TemporalJoins
    import graft.functions.Hashing
    val cust = table(s, dir, "customer")
    val dim = cust
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        lit(0L).as("eff_us"))
      .unionByName(cust
        .filter(Hashing.hash32(concat(lit("scd:"),
          col("c_custkey").cast("string"))) % 4 === 0)
        .select(col("c_custkey"),
          concat(lit("x"), col("c_mktsegment")).as("seg"),
          lit(java.time.LocalDate.of(1998, 1, 1).toEpochDay * 86400000000L)
            .as("eff_us")))
    val o = table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_totalprice"))
    TemporalJoins.asOf(o, col("o_custkey"), col("us"),
        dim, col("c_custkey"), col("eff_us"))
      .filter(col("matched").isNotNull) // inner, like the oracle's ASOF JOIN
      .select(col("matched.seg").as("seg"), col("o_totalprice"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(D)), 2).cast("double").as("total"))
  }

  /** Correlated scalar subquery (the TPC-H Q17 shape): lineitems whose
    * quantity sits under 0.2× their PART's average quantity — "small
    * orders" revenue per brand. The Spark side is written AS the
    * correlated subquery (two per-part scalar aggregates referenced from
    * the WHERE clause) and Catalyst decorrelates: the executed plan is
    * ONE per-part aggregate joined back to the fact — never a per-row
    * subquery execution (PlanSpec pins it). Exactness: the 0.2·avg
    * threshold cross-multiplies to integers (5·qs·n < Σqs — no float
    * average), and revenue sums cents exactly before the div-7
    * weekly-rate conversion.
    *
    * Scale shape: the per-part aggregate is map-side combined over the
    * same lineitem scan, the join is partkey-equi (AQE handles skew),
    * and the brand dim broadcasts — Q17 at 100 TB is two shuffles.
    */
  val q192ScalarSubquery = Q.checked(
    "q192_scalar_subquery",
    """WITH li AS (
      |  SELECT l_partkey, CAST(round(CAST(l_quantity AS DOUBLE) * 100) AS BIGINT) AS qs,
      |         CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS epc
      |  FROM lineitem),
      |agg AS (SELECT l_partkey, CAST(sum(qs) AS BIGINT) AS sq, count(*) AS n
      |        FROM li GROUP BY l_partkey)
      |SELECT p.p_brand AS brand, count(*) AS n_small,
      |  CAST(CAST(sum(li.epc) AS HUGEINT) // 7 AS BIGINT) AS weekly_cents
      |FROM li JOIN agg a ON a.l_partkey = li.l_partkey
      |JOIN part p ON p.p_partkey = li.l_partkey
      |WHERE 5 * li.qs * a.n < a.sq
      |GROUP BY p.p_brand""") { (s, dir) =>
    table(s, dir, "lineitem")
      .select(col("l_partkey"),
        round(col("l_quantity").cast("double") * 100).cast("long").as("qs"),
        round(col("l_extendedprice").cast("double") * 100).cast("long").as("epc"))
      .createOrReplaceTempView("q192_li")
    table(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      .createOrReplaceTempView("q192_part")
    s.sql("""
      SELECT brand, count(*) AS n_small,
        CAST(CAST(sum(epc) AS DECIMAL(38,0)) div 7 AS BIGINT) AS weekly_cents
      FROM (
        SELECT l.qs, l.epc, p.p_brand AS brand,
          (SELECT struct(count(*) AS n, sum(l2.qs) AS sq) FROM q192_li l2
           WHERE l2.l_partkey = l.l_partkey) AS st
        FROM q192_li l JOIN q192_part p ON p.p_partkey = l.l_partkey)
      WHERE 5 * qs * st.n < st.sq
      GROUP BY brand""")
  }

  /** SCD2 dimension BUILD — the other half of q181 (which CONSUMES a
    * type-2 dimension): turn an attribute change LOG into the
    * effective/expiry-dated dimension rows themselves. Each key's
    * changes order by event time; a row's expiry is the next change
    * minus 1 µs (half-open intervals with no gaps or overlaps by
    * construction), the latest row stays open (NULL expiry,
    * is_current). The change log reuses q181's deterministic synthesis
    * (every customer's base row at t₀; a hash-selected quarter gets a
    * segment change at 1998-01-01) so the build provably produces the
    * dimension q181 joins against.
    *
    * Scale shape: ONE lead window partitioned by the dimension key —
    * bounded by a key's own change count (SCD cardinality, never fact
    * volume); no join, no second scan.
    */
  val q202Scd2Build = Q.checked(
    "q202_scd2_build",
    """WITH log AS (
      |  SELECT c_custkey, c_mktsegment AS seg, CAST(0 AS BIGINT) AS ts_us FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'x' || c_mktsegment, epoch_us(TIMESTAMP '1998-01-01')
      |  FROM customer
      |  WHERE ('0x'||substring(md5('scd:'||CAST(c_custkey AS VARCHAR)),1,8))::BIGINT % 4 = 0)
      |SELECT c_custkey, seg, ts_us AS eff_us,
      |  lead(ts_us) OVER (PARTITION BY c_custkey ORDER BY ts_us) - 1 AS exp_us,
      |  CAST(lead(ts_us) OVER (PARTITION BY c_custkey ORDER BY ts_us) IS NULL AS BOOLEAN) AS is_current
      |FROM log""") { (s, dir) =>
    import graft.functions.Hashing
    import org.apache.spark.sql.expressions.Window
    val cust = table(s, dir, "customer")
    val log = cust
      .select(col("c_custkey"), col("c_mktsegment").as("seg"), lit(0L).as("ts_us"))
      .unionByName(cust
        .filter(Hashing.hash32(concat(lit("scd:"),
          col("c_custkey").cast("string"))) % 4 === 0)
        .select(col("c_custkey"),
          concat(lit("x"), col("c_mktsegment")).as("seg"),
          lit(java.time.LocalDate.of(1998, 1, 1).toEpochDay * 86400000000L)
            .as("ts_us")))
    val nxt = lead(col("ts_us"), 1).over(
      Window.partitionBy(col("c_custkey")).orderBy(col("ts_us")))
    log.select(col("c_custkey"), col("seg"), col("ts_us").as("eff_us"),
      (nxt - 1).as("exp_us"), nxt.isNull.as("is_current"))
  }

  val all: Vector[Q] =
    Vector(q10JoinInner, q11JoinOuter, q12JoinOverride, q13JoinTagged,
      q14SemiAnti, q63cBloomSemi, q67BucketedJoin, q69AsofJoin, q80RangeJoin,
      q107SaltedJoin, q149StarJoin, q161Attribution, q165DppPrune,
      q172OverlapJoin, q181Scd2Join, q192ScalarSubquery, q202Scd2Build)
}
