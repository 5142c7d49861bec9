package graft.queries

import graft.Q
import graft.core.Graft.table
import graft.operators.Aggregates
import graft.functions.TypedAggs
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The aggregate framework surface (SURVEY §2.4): descriptor DSL, capped
  * UniqValueCount, ValueHistogram report, Long/String max/min, distinct,
  * and the typed-Aggregator UDAF path. Mirrors
  * `src/test/org/apache/hadoop/mapred/lib/aggregate/TestAggregates.java`.
  */
object AggQueries {

  /** Descriptor-DSL aggregation (`aggregator.descriptor.N`,
    * `ValueAggregatorJob.java:215-218`): five registry types compiled to
    * one groupBy over events. Catalyst's partial aggregation is the
    * reference's ValueAggregatorCombiner, free.
    */
  val q20AggDescriptor = Q.checked(
    "q20_agg_descriptor",
    """SELECT event_type,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS doublevaluesum_value,
      |  max(user_id) AS longvaluemax_user_id,
      |  min(user_id) AS longvaluemin_user_id,
      |  max(props) AS stringvaluemax_props,
      |  min(props) AS stringvaluemin_props,
      |  CAST(sum(user_id) AS BIGINT) AS longvaluesum_user_id
      |FROM events GROUP BY event_type""") { (s, dir) =>
    Aggregates.aggregate(
      table(s, dir, "events"),
      col("event_type"),
      Seq(
        "DoubleValueSum:value",
        "LongValueMax:user_id",
        "LongValueMin:user_id",
        "StringValueMax:props",
        "StringValueMin:props",
        "LongValueSum:user_id"))
  }

  /** Capped UniqValueCount (`UniqValueCount.java:36,81-86`) with the
    * engine's deterministic sorted-cap semantics: capped distinct count +
    * the first 10 distinct values in sorted order.
    */
  val q21UniqCapped = Q.checked(
    "q21_uniq_capped",
    """SELECT event_type,
      |  least(count(DISTINCT user_id % 97), 10) AS uniq_cnt,
      |  array_to_string(list_slice(list_sort(list(DISTINCT CAST(user_id % 97 AS VARCHAR))), 1, 10), ',') AS uniq_items
      |FROM events GROUP BY event_type""") { (s, dir) =>
    val v = col("user_id") % 97
    val (cnt, items) = Aggregates.uniqValueCount(v, 10)
    table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(cnt.as("uniq_cnt"), items.as("uniq_items"))
  }

  /** ValueHistogram report (`ValueHistogram.java:78-134`): frequency
    * distribution of value buckets per event type — [uniq, min, median,
    * max, mean, stddev_pop] of the frequencies, median = sorted
    * counts[n/2] exactly as the reference computes it.
    *
    * Runs through the SELF-ROUTING variant ([[Aggregates.valueHistogramAuto]]):
    * keys here are far under the exact cap, so every median takes the
    * exact branch and the oracle match proves the auto path byte-equal to
    * the reference recipe on ordinary data; ScaleSpec drives its approx
    * branch on a degenerate 10⁶-distinct key.
    */
  val q22Histogram = Q.checked(
    "q22_histogram",
    """WITH freq AS (
      |  SELECT event_type AS k, CAST(floor(value / 50) AS BIGINT) AS v, count(*) AS f
      |  FROM events GROUP BY 1, 2
      |), ranked AS (
      |  SELECT k, v, f,
      |         row_number() OVER (PARTITION BY k ORDER BY f DESC, v) AS dn
      |  FROM freq
      |)
      |SELECT k, count(*) AS uniq, min(f) AS min_f,
      |  (list_sort(list(f)))[CAST(count(*) // 2 AS BIGINT) + 1] AS median_f,
      |  max(f) AS max_f,
      |  CAST(sum(f) AS DOUBLE) / count(*) AS avg_f,
      |  sqrt((CAST(sum(f*f) AS DOUBLE) - CAST(sum(f) AS DOUBLE) * CAST(sum(f) AS DOUBLE) / count(*)) / count(*)) AS sd_f,
      |  string_agg(CASE WHEN dn <= 5 THEN CAST(v AS VARCHAR) || ':' || CAST(f AS VARCHAR) END, ',' ORDER BY dn)
      |    || CASE WHEN count(*) > 5 THEN ',+' || CAST(count(*) - 5 AS VARCHAR) ELSE '' END AS details
      |FROM ranked GROUP BY k""") { (s, dir) =>
    Aggregates.valueHistogramAuto(
      table(s, dir, "events"),
      col("event_type"),
      floor(col("value") / 50).cast("long"),
      detailsTopN = 5)
      .drop("median_is_approx")
  }

  /** Long/String ValueMax/Min quick wins over supplier per nation. */
  val q23MaxMin = Q.checked(
    "q23_maxmin",
    """SELECT s_nationkey,
      |  max(s_acctbal) AS max_bal, min(s_acctbal) AS min_bal,
      |  max(s_name) AS max_name, min(s_name) AS min_name
      |FROM supplier GROUP BY s_nationkey""") { (s, dir) =>
    table(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        max(col("s_acctbal")).as("max_bal"), min(col("s_acctbal")).as("min_bal"),
        max(col("s_name")).as("max_name"), min(col("s_name")).as("min_name"))
      .select(col("s_nationkey").cast("int").as("s_nationkey"), col("max_bal"),
        col("min_bal"), col("max_name"), col("min_name"))
  }

  /** distinct / dropDuplicates (SURVEY §2.4 "distinct (pattern)"). */
  val q24Distinct = Q.checked(
    "q24_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") { (s, dir) =>
    table(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()
  }

  /** The typed-Aggregator UDAF path (SURVEY §2.10): CappedUniq as a custom
    * `Aggregator` with a bounded sorted buffer, exercised per event_type
    * over a different derived value than q21.
    */
  val q25UniqTyped = Q.checked(
    "q25_uniq_typed",
    """SELECT event_type,
      |  least(count(DISTINCT user_id % 13), 5) AS cnt,
      |  array_to_string(list_slice(list_sort(list(DISTINCT CAST(user_id % 13 AS VARCHAR))), 1, 5), ',') AS items
      |FROM events GROUP BY event_type""") { (s, dir) =>
    val cappedUniq = udaf(new TypedAggs.CappedUniq(5))
    table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(cappedUniq((col("user_id") % 13).cast("string")).as("r"))
      .select(col("event_type"), col("r.cnt").as("cnt"), col("r.items").as("items"))
  }

  /** Per-group z-score outlier detection — the statistical quality-filter
    * a curation pipeline runs before training: per event_type moments in
    * exact DECIMAL (one cast to DOUBLE at the end, so both engines derive
    * bit-identical mean/variance), broadcast back onto the fact rows, and
    * rows beyond 3σ flagged. The z column is a raw DOUBLE — the compare
    * is on bits, and every operation from the decimal sums onward is the
    * same IEEE expression on both engines. A zero-variance (or singleton)
    * group is guarded out explicitly: 0/0 is NaN in Spark but NULL in
    * DuckDB, and `abs(NaN) > 3` holds in Spark — without the guard a
    * constant group would flag EVERY row as an outlier.
    */
  val q78ZscoreOutliers = Q.checked(
    "q78_zscore_outliers",
    """WITH st AS (
      |  SELECT event_type AS et, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
      |    CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sq
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  (e.value - s / n) / sqrt((sq - s * s / n) / n) AS z
      |FROM events e JOIN st ON st.et = e.event_type
      |WHERE (sq - s * s / n) / n > 0
      |  AND abs((e.value - s / n) / sqrt((sq - s * s / n) / n)) > 3""") { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val ev = table(s, dir, "events")
    val v = col("value").cast(DecimalType(18, 4))
    val st = ev.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        sum(v).cast("double").as("s"),
        sum(v * v).cast("double").as("sq"))
    val z = (col("value") - col("s") / col("n")) /
      sqrt((col("sq") - col("s") * col("s") / col("n")) / col("n"))
    val variance = (col("sq") - col("s") * col("s") / col("n")) / col("n")
    ev.join(broadcast(st), col("event_type") === col("et"))
      .withColumn("z", z)
      .filter(variance > 0 && abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
  }

  /** Pivot (long→wide): per-user event counts spread over the fixed
    * event-type vocabulary. The value list is EXPLICIT — `pivot(col)`
    * without one runs a driver-side distinct pass over the pivot column
    * and makes the output schema data-dependent, both wrong at 100 TB;
    * with the list it compiles to one grouped aggregation of conditional
    * counts (exactly the oracle's FILTER form), map-side combined, no
    * extra pass.
    */
  val q82Pivot = Q.checked(
    "q82_pivot",
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id""") { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    table(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot(col("event_type"), types)
      .agg(count(lit(1)))
      // pivot emits NULL for absent (user, type) cells; the oracle's
      // FILTER count emits 0 — align on 0
      .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Unpivot (wide→long melt): lineitem's three money/quantity measures
    * reshaped into (metric, value) rows. Pure reshaping — values pass
    * through untouched (no arithmetic), so the parquet doubles compare
    * bit-for-bit. The plan is map-only: an unpivot is a per-row explode,
    * no shuffle at any scale.
    */
  val q83Unpivot = Q.checked(
    "q83_unpivot",
    """SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem""") { (s, dir) =>
    table(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_discount"), col("l_extendedprice"), col("l_quantity")),
        "metric", "value")
  }

  /** CUBE over order status × priority: all four grouping combinations in
    * one pass, disambiguated by grouping_id (a rolled-up NULL vs a data
    * NULL). One shuffle; Spark expands the grouping sets map-side with
    * partial aggregation per set.
    */
  val q84Cube = Q.checked(
    "q84_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""") { (s, dir) =>
    table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"), col("n"))
  }

  /** Pearson correlation + regression slope of event value vs the JSON
    * `k` property, per event type — built from EXACT decimal moments
    * (Σx, Σy, Σxy, Σx², Σy² all DECIMAL, cast to double ONCE) and a fixed
    * IEEE op tree, so both engines emit bit-identical doubles. Spark's
    * builtin `corr` is a streaming Welford accumulation whose result
    * depends on partition order — unusable for cross-engine identity; the
    * moment form is order-free. Zero-variance groups emit NULL on both
    * sides (never a NaN-vs-NULL split).
    */
  val q88Corr = Q.checked(
    "q88_corr",
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4)) * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4))) AS DOUBLE) AS sxy
      |  FROM events GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |    THEN (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) END AS corr_vk,
      |  CASE WHEN n*sxx - sx*sx > 0
      |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope
      |FROM m""") { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val x = col("value").cast(DecimalType(18, 4))
    val y = get_json_object(col("props"), "$.k").cast(DecimalType(18, 4))
    val m = table(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
    def nz(c: Column) = c > 0
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    m.select(col("event_type"), col("n").cast("long").as("n"),
      when(nz(varX) && nz(varY), cov / (sqrt(varX) * sqrt(varY)))
        .as("corr_vk"),
      when(nz(varX), cov / varX).as("slope"))
  }

  /** Exact discrete percentiles (p50/p90/p99 of extended price per return
    * flag) by rank selection: row_number over a per-group sort, group
    * sizes from a broadcast aggregate (NOT count-over-window, which would
    * buffer whole partitions), and the value at rank ceil(q·n) picked by
    * conditional max. Values pass through untouched — bit-identical
    * doubles. This is the honest EXACT path (a per-group sort is what
    * exactness costs); the sketch path for 100 TB is percentile_approx
    * (see Aggregates.valueHistogramApprox).
    */
  val q89Percentiles = Q.checked(
    "q89_percentiles",
    """WITH n AS (
      |  SELECT l_returnflag AS flag, count(*) AS n FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END) AS p50,
      |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN l_extendedprice END) AS p90,
      |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN l_extendedprice END) AS p99
      |FROM r JOIN n ON n.flag = r.l_returnflag
      |GROUP BY l_returnflag""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val li = table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val n = li.groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def pick(q: Double) = max(when(
      col("rn") === ceil(lit(q) * col("n")).cast("long"),
      col("l_extendedprice")))
    li.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(n), col("flag") === col("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
  }

  /** Deterministic count-min heavy hitters
    * ([[graft.operators.Sketches.countMinDeterministic]]): the 4×1024
    * md5-hashed sketch over the full token frequency table, probed at the
    * exact top-20 tokens — output carries the true count AND the sketch
    * estimate side by side (estimate ≥ truth always; equality means no
    * bucket collision among heavier tokens). Unlike the opaque
    * `df.stat.countMinSketch` (spec-checked only), every cell here is
    * reproducible in any engine — the whole point of the oracle row.
    *
    * Scale shape: one map-side-combined token count (the q71b shape),
    * then a 4096-cell fold; the probe side is 20×4 rows joined against
    * the broadcast cell table. Nothing driver-side, nothing
    * cardinality-sized after the first aggregation.
    */
  val q130CmsHeavyHitters = Q.checked(
    "q130_cms_heavy_hitters",
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
      |cells AS (
      |  SELECT i, ('0x'||substr(md5(term || '#' || CAST(i AS VARCHAR)),1,8))::BIGINT % 1024 AS bucket,
      |    CAST(sum(cnt) AS BIGINT) AS cell
      |  FROM cnt CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) GROUP BY 1, 2),
      |top AS (
      |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
      |  FROM cnt QUALIFY rank <= 20),
      |probe AS (
      |  SELECT t.term, t.cnt, t.rank, min(c.cell) AS cms_cnt
      |  FROM top t CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) q
      |  JOIN cells c ON c.i = q.i
      |    AND c.bucket = ('0x'||substr(md5(t.term || '#' || CAST(q.i AS VARCHAR)),1,8))::BIGINT % 1024
      |  GROUP BY 1, 2, 3)
      |SELECT term, cnt, cms_cnt, rank FROM probe""") { (s, dir) =>
    import graft.operators.{Dedup, Sketches}
    import org.apache.spark.sql.expressions.Window
    val cnt = table(s, dir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds the sketch build AND the top-20 probe
    val cells = broadcast(Sketches.countMinDeterministic(cnt, "term", "cnt"))
    val top = cnt.orderBy(col("cnt").desc, col("term")).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    top
      .select(col("term"), col("cnt"), col("rank"),
        explode(array((0 until 4).map(lit): _*)).as("i"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("term"), lit("#"), col("i"))), 1, 8), 16, 10)
          .cast("long") % 1024)
      .join(cells, Seq("i", "bucket"))
      .groupBy(col("term"), col("cnt"), col("rank"))
      .agg(min(col("cell")).as("cms_cnt"))
      .select(col("term"), col("cnt"), col("cms_cnt"), col("rank"))
  }

  /** Deterministic HyperLogLog cardinality
    * ([[graft.operators.Sketches.hllCountDistinct]]): per event type, the
    * 256-register integer-exact HLL estimate of distinct users next to
    * the exact count — the fixed-memory cardinality answer whose result
    * a second engine can replay register for register (Spark's own
    * `approx_count_distinct` cannot be oracle-checked). At m = 256 the
    * standard error is 1.04/√m ≈ 6.5%; the green hash row proves the
    * ESTIMATOR, the spec proves the accuracy envelope.
    */
  val q131HllUsers = Q.checked(
    "q131_hll_users",
    s"""WITH h AS (
      |  SELECT event_type,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h % 256 AS bucket,
      |    CASE WHEN (h // 256) % 1099511627776 = 0 THEN 41
      |         ELSE 41 - length(bin((h // 256) % 1099511627776)) END AS rank
      |  FROM h),
      |reg AS (SELECT event_type, bucket, max(rank) AS mrank FROM r GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(sum(1::BIGINT << (41 - mrank)) AS BIGINT) AS sp,
      |    count(*) AS nb
      |  FROM reg GROUP BY 1),
      |e AS (
      |  SELECT event_type,
      |    103513989865891026 // (sp + (256 - nb) * (1::BIGINT << 41)) AS raw,
      |    256 - nb AS v
      |  FROM s),
      |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY 1)
      |SELECT e.event_type, x.exact_users,
      |  CASE WHEN e.raw <= 640 AND e.v > 0
      |       THEN (${graft.operators.Sketches.lcTableSql})[e.v]
      |       ELSE e.raw END AS hll_users
      |FROM e JOIN x USING (event_type)""") { (s, dir) =>
    import graft.operators.Sketches
    val ev = table(s, dir, "events")
    val est = Sketches.hllCountDistinct(ev, col("event_type"), col("user_id"))
      .select(col("g").as("event_type"), col("hll_est").as("hll_users"))
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_users"), col("hll_users"))
  }

  /** HLL register MERGE ([[graft.operators.Sketches.hllRegisters]] +
    * two-level max): per-(type, day) register tables rolled up across
    * days by `max(mrank)` per (type, bucket), then estimated — the
    * REAGGREGATABILITY property that makes sketches the 100 TB answer:
    * daily jobs persist 256-row register tables, and any cube cell
    * (week, month, all-time) folds them without rescanning an event.
    * The estimate after the merge is definitionally equal to q131's
    * one-shot build (max is associative); the green hash row pins the
    * two-level plumbing — day keys, register join identity, the shared
    * estimator — across engines.
    */
  val q134HllMerge = Q.checked(
    "q134_hll_merge",
    s"""WITH h AS (
      |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |    ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, day, h % 256 AS bucket,
      |    CASE WHEN (h // 256) % 1099511627776 = 0 THEN 41
      |         ELSE 41 - length(bin((h // 256) % 1099511627776)) END AS rank
      |  FROM h),
      |daily AS (SELECT event_type, day, bucket, max(rank) AS mrank
      |  FROM r GROUP BY 1, 2, 3),
      |merged AS (SELECT event_type, bucket, max(mrank) AS mrank
      |  FROM daily GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(sum(1::BIGINT << (41 - mrank)) AS BIGINT) AS sp,
      |    count(*) AS nb
      |  FROM merged GROUP BY 1),
      |e AS (
      |  SELECT event_type,
      |    103513989865891026 // (sp + (256 - nb) * (1::BIGINT << 41)) AS raw,
      |    256 - nb AS v
      |  FROM s),
      |d AS (SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, d.n_days,
      |  CASE WHEN e.raw <= 640 AND e.v > 0
      |       THEN (${graft.operators.Sketches.lcTableSql})[e.v]
      |       ELSE e.raw END AS hll_users
      |FROM e JOIN d USING (event_type)""") { (s, dir) =>
    import graft.operators.Sketches
    val ev = table(s, dir, "events")
    val daily = Sketches.hllRegisters(ev,
      concat(col("event_type"), lit("|"), col("ts").cast("date").cast("string")),
      col("user_id"))
    val merged = daily
      .select(substring_index(col("g"), "|", 1).as("event_type"),
        col("bucket"), col("mrank"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("mrank")).as("mrank"))
    val est = Sketches.hllEstimate(
        merged.select(col("event_type").as("g"), col("bucket"), col("mrank")))
      .select(col("g").as("event_type"), col("hll_est").as("hll_users"))
    val days = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("ts").cast("date")).as("n_days"))
    days.join(est, "event_type")
      .select(col("event_type"), col("n_days"), col("hll_users"))
  }

  /** Exact grouped percentiles, the SCALE path
    * ([[graft.operators.Percentiles.exact]]): q89 proves nearest-rank
    * percentiles with a per-group raw-row window — correct, but at 100 TB
    * one group's rows all sort inside one window task. This is the same
    * exact answer with no window at all: collapse to a per-(group, value)
    * histogram (map-side combined), run the two-pass distributed prefix
    * sum over it (the Packing/SortValidate pattern — the driver sees
    * #partitions × #groups longs, never data), and read each percentile
    * off the cumulative counts with all-integer rank targets
    * ⌈p·n/100⌉ = (p·n + 99) div 100. The oracle is the WINDOW algorithm
    * over the same scaled values — two algorithms, one answer, so a green
    * row proves the prefix-sum path exactly reproduces the textbook
    * definition. Values ride the scaled-long domain (micros), so there is
    * no float compare anywhere.
    */
  val q141ExactPctHist = Q.checked(
    "q141_exact_pct_hist",
    """WITH v AS (
      |  SELECT event_type, CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events),
      |n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
      |r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      |  FROM v),
      |p AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p)
      |SELECT r.event_type, p.p, min(r.v) AS pct, CAST(max(n.n) AS BIGINT) AS n
      |FROM r JOIN n USING (event_type) CROSS JOIN p
      |WHERE rn >= (p.p * n.n + 99) // 100
      |GROUP BY r.event_type, p.p""") { (s, dir) =>
    import graft.operators.Percentiles
    val ev = table(s, dir, "events")
      .select(col("event_type"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
    Percentiles.exact(ev, "event_type", "v", Seq(50, 90, 99))
      .select(col("g").as("event_type"), col("p"), col("pct"), col("n"))
  }

  /** Robust outlier detection by median absolute deviation — the
    * heavy-tail-safe complement to q78's z-score (one wild day drags a
    * mean and explodes a stddev; the median and MAD shrug): per event
    * type, median of the scaled values, MAD = median of |v − median|,
    * and the count of values beyond 3 MADs — the standard robust fence,
    * integer cross-multiplied (|v − med| > 3·mad), no float moment
    * anywhere. The operator COMPOSES [[graft.operators.Percentiles
    * .exact]] twice (p=50 over values, then p=50 over deviations), so
    * the scale posture is inherited: two histogram prefix sums, never a
    * per-group raw-row sort. Oracle = the q89 window algorithm unrolled
    * twice over the same integers.
    */
  val q153MadOutliers = Q.checked(
    "q153_mad_outliers",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events),
      |n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
      |r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      |  FROM v),
      |med AS (
      |  SELECT r.event_type, min(r.v) AS med
      |  FROM r JOIN n USING (event_type)
      |  WHERE rn >= (50 * n.n + 99) // 100 GROUP BY r.event_type),
      |d AS (
      |  SELECT v.event_type, abs(v.v - med.med) AS dev
      |  FROM v JOIN med USING (event_type)),
      |r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn
      |  FROM d),
      |mad AS (
      |  SELECT r2.event_type, min(r2.dev) AS mad
      |  FROM r2 JOIN n USING (event_type)
      |  WHERE rn >= (50 * n.n + 99) // 100 GROUP BY r2.event_type)
      |SELECT v.event_type, max(med.med) AS med, max(mad.mad) AS mad,
      |  count(*) AS n,
      |  CAST(count(CASE WHEN abs(v.v - med.med) > 3 * mad.mad THEN 1 END) AS BIGINT)
      |    AS n_outliers
      |FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
      |GROUP BY v.event_type""") { (s, dir) =>
    import graft.operators.Percentiles
    val ev = table(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
      .localCheckpoint(true) // scanned by both percentile passes + the fence
    val med = Percentiles.exact(ev, "event_type", "v", Seq(50))
      .select(col("g").as("event_type"), col("pct").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v") - col("med")).as("dev"))
    val mad = Percentiles.exact(dev, "event_type", "dev", Seq(50))
      .select(col("g").as("event_type"), col("pct").as("mad"))
    ev.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(abs(col("v") - col("med")) > lit(3) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group winsorization — the APPLY member of the percentile family
    * (q152 bins, q153 fences, this row clips): event values clamped to
    * their type's [p05, p95] band, the heavy-tail-robust normalization a
    * feature pipeline runs before aggregating skewed metrics. Composes
    * [[graft.operators.Percentiles.exact]] (the no-window scale path —
    * a 100 TB group never sorts inside one task), pivots the two
    * thresholds to a groups-sized broadcast, and clamps map-side; output
    * is the per-type audit: row count, clipped-low/high counts, the
    * band, and exact scaled sums before/after (the winsorized mean's
    * numerator, BIGINT end to end). The oracle re-derives the
    * nearest-rank thresholds with the q141 window algorithm — two
    * algorithms, one answer, on both the thresholds and the clamp.
    */
  val q174Winsorize = Q.checked(
    "q174_winsorize",
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events),
      |n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
      |r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
      |  FROM v),
      |p AS (SELECT CAST(unnest([5, 95]) AS BIGINT) AS p),
      |thr0 AS (
      |  SELECT r.event_type, p.p, min(r.v) AS pct
      |  FROM r JOIN n USING (event_type) CROSS JOIN p
      |  WHERE rn >= (p.p * n.n + 99) // 100
      |  GROUP BY r.event_type, p.p),
      |thr AS (
      |  SELECT event_type, min(CASE WHEN p = 5 THEN pct END) AS lo,
      |         min(CASE WHEN p = 95 THEN pct END) AS hi
      |  FROM thr0 GROUP BY event_type),
      |w AS (
      |  SELECT v.event_type, v.v, greatest(thr.lo, least(thr.hi, v.v)) AS w,
      |         thr.lo, thr.hi
      |  FROM v JOIN thr USING (event_type))
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |  min(lo) AS lo, min(hi) AS hi,
      |  CAST(sum(v) AS BIGINT) AS sum_v, CAST(sum(w) AS BIGINT) AS sum_w
      |FROM w GROUP BY event_type""") { (s, dir) =>
    import graft.operators.Percentiles
    val ev = table(s, dir, "events")
      .select(col("event_type"),
        round(col("value").cast("double") * 1000000d).cast("long").as("v"))
    val thr = Percentiles.exact(ev, "event_type", "v", Seq(5, 95))
      .groupBy(col("g").as("event_type"))
      .agg(min(when(col("p") === 5, col("pct"))).as("lo"),
        min(when(col("p") === 95, col("pct"))).as("hi"))
    ev.join(broadcast(thr), "event_type")
      .select(col("event_type"), col("v"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("v"))).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(col("v")).as("sum_v"), sum(col("w")).as("sum_w"))
  }

  /** WEIGHTED grouped percentiles — the mass-weighted member of the
    * percentile family ([[graft.operators.Percentiles.exactWeighted]]):
    * quartiles of extended price per return flag where each lineitem
    * counts its QUANTITY units of mass, the "median price per unit
    * shipped" a pricing pipeline wants (a 50-unit line influences the
    * distribution 50× a 1-unit line). Same no-window scale path as
    * q141 — histogram + two-pass distributed prefix sum over cumulative
    * WEIGHT, target rank ⌈p·W/100⌉, a 100 TB group never sorts inside
    * one task. The oracle re-derives the thresholds with a cumulative-
    * weight window (RANGE frame, so ties share their full mass) — two
    * algorithms, one answer.
    */
  val q190WeightedPct = Q.checked(
    "q190_weighted_pct",
    """WITH v AS (
      |  SELECT l_returnflag AS g,
      |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS v,
      |    CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem),
      |n AS (SELECT g, CAST(sum(w) AS BIGINT) AS n FROM v GROUP BY g),
      |r AS (SELECT g, v, sum(w) OVER (PARTITION BY g ORDER BY v) AS cw FROM v),
      |p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS p)
      |SELECT r.g, p.p, min(r.v) AS pct, CAST(max(n.n) AS BIGINT) AS n
      |FROM r JOIN n USING (g) CROSS JOIN p
      |WHERE cw >= (p.p * n.n + 99) // 100
      |GROUP BY r.g, p.p""") { (s, dir) =>
    import graft.operators.Percentiles
    val v = table(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice").cast("double") * 100).cast("long").as("v"),
        col("l_quantity").cast("long").as("w"))
    Percentiles.exactWeighted(v, "g", "v", col("w"), Seq(25, 50, 75))
  }

  /** DISTRIBUTION DRIFT monitor — the data-drift gate an ML pipeline
    * runs between training snapshots (the integer-exact cousin of PSI):
    * per event type, the value distribution over fixed bins is compared
    * between the early and late half of the time range, reporting the
    * L1 distance of the two share vectors in ppm (0 = identical shape,
    * 2e6 = disjoint). All integer — ppm shares by widened floor
    * division, |Δ| summed exactly — where PSI's log-ratio would drift
    * cross-engine. The midpoint derives from the data (min+max over the
    * same scan), so the query is scale- and window-free.
    *
    * Scale shape: one scan → (type, period, bin) counts (map-side
    * combined, output bins×types×2), a types×2 total rollup riding a
    * broadcast, and a types-sized final agg. Nothing is event-scale
    * after the first aggregation.
    */
  val q201DistributionDrift = Q.checked(
    "q201_distribution_drift",
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS v
      |  FROM events),
      |mid AS (SELECT (min(day) + max(day)) // 2 AS m FROM e),
      |b AS (
      |  SELECT event_type, CASE WHEN day <= m THEN 0 ELSE 1 END AS period,
      |    least(9, greatest(0, v // 100000000)) AS bin
      |  FROM e CROSS JOIN mid),
      |c AS (SELECT event_type, period, bin, count(*) AS n FROM b GROUP BY 1,2,3),
      |t AS (SELECT event_type, period, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1,2),
      |sh AS (SELECT c.event_type, c.bin,
      |  CAST(sum(CASE WHEN c.period = 0 THEN CAST(CAST(c.n AS HUGEINT) * 1000000 // t.tot AS BIGINT) ELSE 0 END) AS BIGINT) AS pa,
      |  CAST(sum(CASE WHEN c.period = 1 THEN CAST(CAST(c.n AS HUGEINT) * 1000000 // t.tot AS BIGINT) ELSE 0 END) AS BIGINT) AS pb
      |  FROM c JOIN t ON t.event_type = c.event_type AND t.period = c.period
      |  GROUP BY 1, 2)
      |SELECT event_type, CAST(sum(abs(pa - pb)) AS BIGINT) AS l1_drift_ppm,
      |  count(*) AS bins
      |FROM sh GROUP BY event_type""") { (s, dir) =>
    val ev = table(s, dir, "events")
    val e = ev.select(col("event_type"),
      (graft.core.Graft.tsUs(ev).cast("long") / lit(86400000000L)).cast("long").as("day"),
      round(col("value").cast("double") * 1000000d).cast("long").as("v"))
      .localCheckpoint(true) // feeds the midpoint probe AND the binning
    val mid = e.agg(((min(col("day")) + max(col("day"))) / lit(2L)).cast("long").as("m"))
    val c = e.crossJoin(broadcast(mid))
      .select(col("event_type"),
        when(col("day") <= col("m"), 0).otherwise(1).as("period"),
        least(lit(9L), greatest(lit(0L), expr("v div 100000000"))).as("bin"))
      .groupBy(col("event_type"), col("period"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds totals AND shares
    val t = c.groupBy(col("event_type"), col("period"))
      .agg(sum(col("n")).cast("long").as("tot"))
    c.join(broadcast(t), Seq("event_type", "period"))
      .groupBy(col("event_type"), col("bin"))
      .agg(
        sum(when(col("period") === 0,
          expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div tot AS BIGINT)"))
          .otherwise(0L)).cast("long").as("pa"),
        sum(when(col("period") === 1,
          expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div tot AS BIGINT)"))
          .otherwise(0L)).cast("long").as("pb"))
      .groupBy(col("event_type"))
      .agg(sum(abs(col("pa") - col("pb"))).cast("long").as("l1_drift_ppm"),
        count(lit(1)).as("bins"))
  }

  /** DWELL-TIME percentiles — inter-event gap quartiles per event type
    * (the latency-distribution readout behind engagement and timeout
    * tuning), composing two proven families: the q189-style per-user
    * lead window derives each gap (keyed by the EARLIER event's type,
    * bounded by a user's own history), and
    * [[graft.operators.Percentiles.exact]] turns gaps into exact
    * nearest-rank quartiles with NO per-type window — a 100 TB type
    * never sorts inside one task. The oracle re-derives the thresholds
    * by the rank window (two algorithms, one answer — the q190
    * convention).
    */
  val q203DwellTimePct = Q.checked(
    "q203_dwell_time_pct",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
      |g AS (
      |  SELECT event_type AS etype,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS gap
      |  FROM e QUALIFY gap IS NOT NULL),
      |n AS (SELECT etype, count(*) AS n FROM g GROUP BY etype),
      |r AS (SELECT etype, gap, row_number() OVER (PARTITION BY etype ORDER BY gap) AS rn FROM g),
      |p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS p)
      |SELECT r.etype, p.p, min(r.gap) AS pct, CAST(max(n.n) AS BIGINT) AS n
      |FROM r JOIN n USING (etype) CROSS JOIN p
      |WHERE rn >= (p.p * n.n + 99) // 100
      |GROUP BY r.etype, p.p""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Percentiles
    val ev = table(s, dir, "events")
    val gaps = ev.select(col("user_id"), col("event_type"),
        graft.core.Graft.tsUs(ev).cast("long").as("us"), col("event_id"))
      .select(col("event_type").as("etype"),
        (lead(col("us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id")))
          - col("us")).as("gap"))
      .filter(col("gap").isNotNull)
    Percentiles.exact(gaps, "etype", "gap", Seq(25, 50, 75))
      .select(col("g").as("etype"), col("p"), col("pct"), col("n"))
  }

  /** PARETO / ABC classification — the revenue-concentration report
    * (which parts make the first 80% / next 15% / long tail), built
    * WITHOUT the textbook global running-sum window (a single-partition
    * sort of the whole catalog — the one-task cliff):
    * [[graft.operators.Packing.runningTotal]] computes the inclusive
    * cumulative revenue over the (revenue desc, part) total order by
    * the two-pass distributed prefix sum — the driver holds one partial
    * per partition. Classification is an exact integer compare
    * (100·cum vs 80·total / 95·total; Σ revenue cents ≤ ~6e16 at
    * 100 TB, two orders under the Long bound). The oracle IS the
    * textbook window — two algorithms, one answer.
    */
  val q208ParetoAbc = Q.checked(
    "q208_pareto_abc",
    """WITH r AS (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total FROM r),
      |c AS (
      |  SELECT pk, rev_c,
      |    CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, pk) AS BIGINT) AS cum
      |  FROM r)
      |SELECT c.pk, c.rev_c, c.cum,
      |  CASE WHEN 100 * c.cum <= 80 * t.total THEN 'A'
      |       WHEN 100 * c.cum <= 95 * t.total THEN 'B'
      |       ELSE 'C' END AS cls
      |FROM c CROSS JOIN t""") { (s, dir) =>
    import graft.operators.Packing
    val r = table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(round(col("l_extendedprice").cast("double") * 100).cast("long"))
        .cast("long").as("rev_c"))
      .withColumn("neg", -col("rev_c"))
    val cum = Packing.runningTotal(r, Seq("neg", "pk"), "rev_c")
    val t = cum.agg(max(col("cum")).as("total")) // inclusive max = grand total
    cum.crossJoin(broadcast(t))
      .select(col("pk"), col("rev_c"), col("cum"),
        when(lit(100) * col("cum") <= lit(80) * col("total"), "A")
          .when(lit(100) * col("cum") <= lit(95) * col("total"), "B")
          .otherwise("C").as("cls"))
  }

  /** PER-SEGMENT OLS TREND — slope / intercept / R² of monthly revenue
    * per nation, fit in closed form from exact integer sufficient
    * statistics (n, Σx, Σy, Σx², Σxy, Σy² — the normal equations), never
    * an iterative solver and never an engine-ordered float accumulation:
    * the only floats are the final int→double conversions and one IEEE
    * divide per coefficient, identical in both engines (values past int64
    * convert via an explicit hi/lo 2^32 split — the engines' native wide-
    * int→double conversions round differently, the split op tree doesn't). Two aggregation levels, both map-side combined: event-scale
    * orders collapse to (nation × month) monthly totals first, then the
    * model-sized monthly series folds to six sufficient statistics per
    * nation. Σy² and the cross terms (Σx·Σy, Σy²·n) exceed the Long bound
    * past ~sf100, so the second level accumulates in DECIMAL(38,0)
    * (HUGEINT on the oracle side) — exact at any scale the 38-digit bound
    * admits (Σy² at 100 TB ≈ 1e29 « 1e38).
    */
  val q210RegrTrend = Q.checked(
    "q210_regr_trend",
    """WITH m AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
      |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
      |    CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT nk, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(x * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM m GROUP BY nk),
      |c AS (
      |  SELECT nk, n,
      |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS den,
      |    CAST(sy * sxx - sx * sxy AS DOUBLE) AS inum,
      |    CAST(CAST((n * syy - sy * sy) // 4294967296 AS BIGINT) AS DOUBLE)
      |      * 4294967296 +
      |    CAST(CAST((n * syy - sy * sy) % 4294967296 AS BIGINT) AS DOUBLE) AS vy
      |  FROM st)
      |SELECT nk, CAST(n AS BIGINT) AS n_months,
      |  CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope,
      |  CASE WHEN den = 0 THEN NULL ELSE inum / den END AS intercept,
      |  CASE WHEN den = 0 OR vy = 0 THEN NULL
      |       ELSE (num * num) / (den * vy) END AS r2
      |FROM c""") { (s, dir) =>
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = table(s, dir, "orders")
      .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg(sum(round(col("o_totalprice").cast("double") * 100).cast("long"))
        .cast("long").as("y"))
    val st = m.groupBy(col("nk"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).cast(d38).as("sx"),
        sum(col("y")).cast(d38).as("sy"),
        sum(col("x") * col("x")).cast(d38).as("sxx"),
        sum(col("x") * col("y")).cast(d38).as("sxy"),
        sum(col("y").cast(d38) * col("y").cast(d38)).cast(d38).as("syy"))
    val num  = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den  = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val inum = (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
    // Σy²-scale values exceed int64, where the two engines' wide-int →
    // double conversions round differently (DuckDB's int128 path double-
    // rounds). Convert via an explicit hi/lo 2^32 split instead: both
    // halves are int64-range (correctly-rounded hardware conversions) and
    // the recombination is the identical IEEE op tree in both engines.
    val st2 = st.withColumn("vy0", col("n") * col("syy") - col("sy") * col("sy"))
    val vy = expr("CAST(vy0 DIV 4294967296 AS DOUBLE)") * lit(4294967296d) +
      expr("CAST(vy0 % 4294967296 AS DOUBLE)")
    st2.select(col("nk"), col("n").cast("long").as("n_months"),
      when(den === 0d, lit(null)).otherwise(num / den).as("slope"),
      when(den === 0d, lit(null)).otherwise(inum / den).as("intercept"),
      when(den === 0d || vy === 0d, lit(null))
        .otherwise((num * num) / (den * vy)).as("r2"))
  }

  /** PER-GROUP MIN-MAX SCALING — the feature-normalization pass an ML
    * pipeline runs before training (each value mapped to [0, 1] within
    * its group), kept integer-exact end to end: values pre-scale to
    * micros, the per-group (min, max) is one map-side-combined agg
    * broadcast back onto the fact rows (group count is type-bounded,
    * never event-bounded), and the scaled feature is the exact floor
    * division ⌊(v−min)·10⁶/(max−min)⌋ in ppm — no float division to
    * drift cross-engine. A degenerate (constant) group scales to NULL
    * explicitly rather than dividing by zero. The fact table shuffles
    * zero times: scan → broadcast-join → project.
    */
  val q216MinmaxScale = Q.checked(
    "q216_minmax_scale",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |st AS (SELECT event_type AS et, min(vm) AS mn, max(vm) AS mx
      |       FROM v GROUP BY 1)
      |SELECT event_id, event_type, vm,
      |  CASE WHEN mx = mn THEN NULL
      |       ELSE (vm - mn) * 1000000 // (mx - mn) END AS scaled_ppm
      |FROM v JOIN st ON st.et = v.event_type""") { (s, dir) =>
    val v = table(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value").cast("double") * 1000000).cast("long").as("vm"))
    val st = v.groupBy(col("event_type").as("et"))
      .agg(min(col("vm")).as("mn"), max(col("vm")).as("mx"))
    v.join(broadcast(st), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"), col("vm"),
        when(col("mx") === col("mn"), lit(null))
          .otherwise(expr("(vm - mn) * 1000000 DIV (mx - mn)")).as("scaled_ppm"))
  }

  /** ROLLING 7-DAY CORRELATION between two daily event series (clicks
    * vs purchases) — the co-movement monitor behind "did the funnel
    * decouple this week": [[q88Corr]]'s exact-sufficient-statistics
    * recipe in a sliding calendar frame. Daily counts are exact
    * integers, and the frame is a CALENDAR band (days within 6 days
    * preceding — RANGE, not ROWS, so a missing day in the grid doesn't
    * silently stretch the window). The engine computes the frame as a
    * band self-join on the day grid — the grid is calendar-bounded
    * (model-sized at any event volume), so the build side broadcasts
    * and no single-partition WindowExec ever plans (WindowGuardSpec's
    * net stays universal); the oracle IS the textbook RANGE-frame
    * window — two algorithms, one answer. The correlation is the same
    * IEEE op tree over exact integers both sides; degenerate frames
    * emit NULL explicitly.
    */
  val q221RollingCorr = Q.checked(
    "q221_rolling_corr",
    """WITH x AS (
      |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS xc
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |y AS (
      |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS yc
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |g AS (SELECT x.day_us, x.xc, y.yc FROM x JOIN y USING (day_us)),
      |f AS (
      |  SELECT day_us,
      |    count(*) OVER w AS n,
      |    CAST(sum(xc) OVER w AS BIGINT) AS sx,
      |    CAST(sum(yc) OVER w AS BIGINT) AS sy,
      |    CAST(sum(xc * yc) OVER w AS BIGINT) AS sxy,
      |    CAST(sum(xc * xc) OVER w AS BIGINT) AS sxx,
      |    CAST(sum(yc * yc) OVER w AS BIGINT) AS syy
      |  FROM g WINDOW w AS (ORDER BY day_us
      |    RANGE BETWEEN 518400000000 PRECEDING AND CURRENT ROW))
      |SELECT day_us, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
      |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |  END AS corr7
      |FROM f""") { (s, dir) =>
    val ev = table(s, dir, "events")
    def daily(et: String, out: String) = ev
      .filter(col("event_type") === et)
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as(out))
    val g = daily("click", "xc").join(daily("purchase", "yc"), "day_us")
      .localCheckpoint(true) // tiny day grid, feeds both sides of the band join
    val b = g.select(col("day_us").as("b_day"), col("xc").as("bx"), col("yc").as("by"))
    val f = g.join(broadcast(b),
        col("b_day") >= col("day_us") - lit(518400000000L) && col("b_day") <= col("day_us"))
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("bx")).cast("long").as("sx"),
        sum(col("by")).cast("long").as("sy"),
        sum(col("bx") * col("by")).cast("long").as("sxy"),
        sum(col("bx") * col("bx")).cast("long").as("sxx"),
        sum(col("by") * col("by")).cast("long").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    f.select(col("day_us"), col("n").cast("long").as("n"),
      when(vx > 0 && vy > 0,
        cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("corr7"))
  }

  /** HLL AUDIENCE OVERLAP — sketch-based set intersection across every
    * pair of event types: |A∩B| ≈ |A| + |B| − |A∪B| by inclusion–
    * exclusion, where |A∪B| comes free from HLL mergeability (union of
    * sketches = max per register — the property [[q134HllMerge]] pins).
    * The exact answer needs a user-level join per pair; the sketch
    * answer touches events ONCE (one map-side-combined register build),
    * then every pair estimate is arithmetic over register tables of a
    * few KB — at 100 TB the difference between a shuffle per pair and
    * no shuffle at all. Same deterministic estimator as q131/q134
    * ([[graft.operators.Sketches]]), so every value is integer-exact
    * cross-engine; the intersection estimate may be negative for
    * near-disjoint sets (the known inclusion–exclusion artifact) and is
    * emitted as-is.
    */
  val q224HllOverlap = Q.checked(
    "q224_hll_overlap",
    s"""WITH h AS (
      |  SELECT event_type, ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h % 256 AS bucket,
      |    CASE WHEN (h // 256) % 1099511627776 = 0 THEN 41
      |         ELSE 41 - length(bin((h // 256) % 1099511627776)) END AS rank
      |  FROM h),
      |m AS (SELECT event_type, bucket, max(rank) AS mrank FROM r GROUP BY 1, 2),
      |est AS (
      |  SELECT event_type,
      |    CASE WHEN raw <= 640 AND v > 0
      |         THEN (${graft.operators.Sketches.lcTableSql})[v] ELSE raw END AS e
      |  FROM (
      |    SELECT event_type,
      |      103513989865891026 // (sp + (256 - nb) * (1::BIGINT << 41)) AS raw,
      |      256 - nb AS v
      |    FROM (SELECT event_type, CAST(sum(1::BIGINT << (41 - mrank)) AS BIGINT) AS sp,
      |          count(*) AS nb FROM m GROUP BY 1))),
      |ty AS (SELECT DISTINCT event_type FROM m),
      |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
      |          FROM ty a JOIN ty b ON a.event_type < b.event_type),
      |um AS (
      |  SELECT ta, tb, bucket, max(mrank) AS mrank FROM (
      |    SELECT p.ta, p.tb, m.bucket, m.mrank FROM pairs p JOIN m ON m.event_type = p.ta
      |    UNION ALL
      |    SELECT p.ta, p.tb, m.bucket, m.mrank FROM pairs p JOIN m ON m.event_type = p.tb)
      |  GROUP BY 1, 2, 3),
      |ue AS (
      |  SELECT ta, tb,
      |    CASE WHEN raw <= 640 AND v > 0
      |         THEN (${graft.operators.Sketches.lcTableSql})[v] ELSE raw END AS union_est
      |  FROM (
      |    SELECT ta, tb,
      |      103513989865891026 // (sp + (256 - nb) * (1::BIGINT << 41)) AS raw,
      |      256 - nb AS v
      |    FROM (SELECT ta, tb, CAST(sum(1::BIGINT << (41 - mrank)) AS BIGINT) AS sp,
      |          count(*) AS nb FROM um GROUP BY 1, 2)))
      |SELECT ue.ta, ue.tb, ea.e AS a_est, eb.e AS b_est, ue.union_est,
      |  ea.e + eb.e - ue.union_est AS inter_est
      |FROM ue
      |JOIN est ea ON ea.event_type = ue.ta
      |JOIN est eb ON eb.event_type = ue.tb""") { (s, dir) =>
    import graft.operators.Sketches
    val ev = table(s, dir, "events")
    val regs = Sketches.hllRegisters(ev, col("event_type"), col("user_id"))
      .localCheckpoint(true) // register-scale: |types| × 256 rows
    val perType = Sketches.hllEstimate(regs)
    val types = regs.select(col("g")).distinct()
    val pairs = types.select(col("g").as("ta"))
      .crossJoin(types.select(col("g").as("tb")))
      .filter(col("ta") < col("tb")) // |types|² rows — model-sized
    val u = pairs.join(regs, col("g") === col("ta"))
      .select(col("ta"), col("tb"), col("bucket"), col("mrank"))
      .unionByName(pairs.join(regs, col("g") === col("tb"))
        .select(col("ta"), col("tb"), col("bucket"), col("mrank")))
      .groupBy(col("ta"), col("tb"), col("bucket"))
      .agg(max(col("mrank")).as("mrank"))
    val uest = Sketches.hllEstimate(
        u.select(concat_ws("|", col("ta"), col("tb")).as("g"),
          col("bucket"), col("mrank")))
      .select(substring_index(col("g"), "|", 1).as("ta"),
        substring_index(col("g"), "|", -1).as("tb"),
        col("hll_est").as("union_est"))
    uest
      .join(perType.select(col("g").as("ta"), col("hll_est").as("a_est")), "ta")
      .join(perType.select(col("g").as("tb"), col("hll_est").as("b_est")), "tb")
      .select(col("ta"), col("tb"), col("a_est"), col("b_est"), col("union_est"),
        (col("a_est") + col("b_est") - col("union_est")).as("inter_est"))
  }

  /** CHI-SQUARE INDEPENDENCE decomposition — is event type independent
    * of day-of-week? The classic contingency-table test, per cell and in
    * EXACT integer ppm: the (O − E)²/E contribution is cleared of its
    * float expectation E = R·C/T into (O·T − R·C)²·10⁶ / (T·R·C), exact
    * in DECIMAL(38,0)/HUGEINT. Emitting per-cell contributions (with a
    * per-type rollup by exact integer sum) sidesteps the one
    * impossibility: a cross-engine float Σ over cells would be
    * engine-ordered; a sum of exact ppm integers is not. Three
    * aggregation levels, all map-side combined; output is
    * |types|×7 cells.
    */
  val q227ChisqIndependence = Q.checked(
    "q227_chisq_independence",
    """WITH o AS (
      |  SELECT event_type AS et, CAST(dayofweek(ts) AS BIGINT) AS dow,
      |    count(*) AS obs
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT et, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
      |c AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
      |t AS (SELECT CAST(sum(obs) AS BIGINT) AS tt FROM o)
      |SELECT o.et, o.dow, o.obs,
      |  CAST((CAST(o.obs AS HUGEINT) * t.tt - r.rt * c.ct)
      |       * (CAST(o.obs AS HUGEINT) * t.tt - r.rt * c.ct) * 1000000
      |       // (CAST(t.tt AS HUGEINT) * r.rt * c.ct) AS BIGINT) AS chi2_ppm
      |FROM o JOIN r USING (et) JOIN c USING (dow) CROSS JOIN t""") { (s, dir) =>
    val o = table(s, dir, "events")
      .groupBy(col("event_type").as("et"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow")) // 0=Sun: DuckDB convention
      .agg(count(lit(1)).as("obs"))
      .localCheckpoint(true) // |types|×7 cells; feeds all three margins
    val r = o.groupBy(col("et").as("et2")).agg(sum(col("obs")).cast("long").as("rt"))
    val c = o.groupBy(col("dow").as("dow2")).agg(sum(col("obs")).cast("long").as("ct"))
    val t = o.agg(sum(col("obs")).cast("long").as("tt"))
    o.join(broadcast(r), col("et") === col("et2"))
      .join(broadcast(c), col("dow") === col("dow2"))
      .crossJoin(broadcast(t))
      .select(col("et"), col("dow"), col("obs"),
        expr("CAST((CAST(obs AS DECIMAL(38,0)) * tt - CAST(rt AS DECIMAL(38,0)) * ct)" +
          " * (CAST(obs AS DECIMAL(38,0)) * tt - CAST(rt AS DECIMAL(38,0)) * ct) * 1000000" +
          " DIV (CAST(tt AS DECIMAL(38,0)) * rt * ct) AS BIGINT)").as("chi2_ppm"))
  }

  /** BENFORD'S LAW AUDIT — the classic fraud / fabricated-data screen:
    * the first-significant-digit distribution of revenue against the
    * Benford expectation log₁₀(1+1/d). The expectations are nine
    * CONSTANTS (they sum to exactly 10⁶ ppm), so no engine ever
    * evaluates a logarithm — observed shares are exact integer ppm and
    * the deviation is a signed subtraction, not a division. One
    * map-side-combined aggregation to nine rows; the first digit is
    * string arithmetic on the integer cents, immune to float formatting.
    */
  val q234Benford = Q.checked(
    "q234_benford",
    """WITH v AS (
      |  SELECT substring(CAST(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS VARCHAR), 1, 1) AS d
      |  FROM lineitem
      |  WHERE l_extendedprice > 0),
      |o AS (SELECT d, count(*) AS n FROM v GROUP BY d),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o)
      |SELECT o.d, o.n,
      |  o.n * 1000000 // t.total AS obs_ppm,
      |  CASE o.d WHEN '1' THEN 301030 WHEN '2' THEN 176091 WHEN '3' THEN 124939
      |           WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66947
      |           WHEN '7' THEN 57992 WHEN '8' THEN 51153 ELSE 45757 END AS exp_ppm,
      |  o.n * 1000000 // t.total
      |    - CASE o.d WHEN '1' THEN 301030 WHEN '2' THEN 176091 WHEN '3' THEN 124939
      |               WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66947
      |               WHEN '7' THEN 57992 WHEN '8' THEN 51153 ELSE 45757 END AS dev_ppm
      |FROM o CROSS JOIN t""") { (s, dir) =>
    // 1-indexed constant table: exp_ppm(d) = round(1e6·log10(1+1/d))
    val expTable = array(Seq(301030, 176091, 124939, 96910, 79181, 66947,
      57992, 51153, 45757).map(v => lit(v.toLong)): _*)
    def exp(d: Column): Column = element_at(expTable, d.cast("int"))
    val o = table(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(round(col("l_extendedprice").cast("double") * 100)
        .cast("long").cast("string"), 1, 1).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val t = o.agg(sum(col("n")).cast("long").as("total"))
    o.crossJoin(broadcast(t))
      .select(col("d"), col("n"),
        expr("n * 1000000 DIV total").as("obs_ppm"),
        exp(col("d")).as("exp_ppm"),
        (expr("n * 1000000 DIV total") - exp(col("d"))).as("dev_ppm"))
  }

  /** SUPPLIER CONCENTRATION (HHI) per part — the procurement-risk
    * audit (a part sourced 95% from one supplier is a supply-chain
    * single point of failure): the Herfindahl–Hirschman index
    * Σ shareₛ² per part, cleared of float shares into the exact
    * integer ppm Σrevₛ²·10⁶ / (Σrevₛ)² with the squares in
    * DECIMAL(38,0)/HUGEINT. Two aggregation levels — (part × supplier)
    * revenue, then the per-part moments — both map-side combined;
    * 10⁶ ppm = single-sourced, 10⁶/n = perfectly split over n.
    */
  val q247HhiConcentration = Q.checked(
    "q247_hhi_concentration",
    """WITH r AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    CAST(sum(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1, 2),
      |st AS (
      |  SELECT pk, count(*) AS n_suppliers,
      |    CAST(sum(CAST(rev_c AS HUGEINT)) AS HUGEINT) AS s,
      |    CAST(sum(CAST(rev_c AS HUGEINT) * rev_c) AS HUGEINT) AS s2
      |  FROM r GROUP BY pk)
      |SELECT pk, n_suppliers,
      |  CASE WHEN s = 0 THEN NULL
      |       ELSE CAST(s2 * 1000000 // (s * s) AS BIGINT) END AS hhi_ppm
      |FROM st""") { (s, dir) =>
    import org.apache.spark.sql.types.{DecimalType => DT}
    val d38 = DT(38, 0)
    val r = table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(round(col("l_extendedprice").cast("double") * 100).cast("long"))
        .cast("long").as("rev_c"))
    r.groupBy(col("pk"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev_c").cast(d38)).cast(d38).as("s"),
        sum(col("rev_c").cast(d38) * col("rev_c").cast(d38)).cast(d38).as("s2"))
      .select(col("pk"), col("n_suppliers"),
        when(col("s") === 0, lit(null))
          .otherwise(expr("CAST(s2 * 1000000 DIV (s * s) AS BIGINT)"))
          .as("hhi_ppm"))
  }

  val all: Vector[Q] =
    Vector(q20AggDescriptor, q21UniqCapped, q22Histogram, q23MaxMin,
      q24Distinct, q25UniqTyped, q78ZscoreOutliers, q82Pivot, q83Unpivot,
      q84Cube, q88Corr, q89Percentiles, q130CmsHeavyHitters, q131HllUsers,
      q134HllMerge, q141ExactPctHist, q153MadOutliers, q174Winsorize,
      q190WeightedPct, q201DistributionDrift, q203DwellTimePct,
      q208ParetoAbc, q210RegrTrend, q216MinmaxScale, q221RollingCorr,
      q224HllOverlap, q227ChisqIndependence, q234Benford,
      q247HhiConcentration)
}
