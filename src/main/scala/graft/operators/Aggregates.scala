package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The aggregate framework (SURVEY §2.4): the reference's declarative
  * GROUP-BY layer re-expressed as descriptor strings compiled to Catalyst
  * aggregate `Column`s.
  *
  * Reference: `src/mapred/org/apache/hadoop/mapred/lib/aggregate/` —
  * mappers emit `"aggType:id,value"` records and shared
  * `ValueAggregatorMapper/Combiner/Reducer` classes fold them; the
  * descriptor registry is `ValueAggregatorBaseDescriptor.java:94-112`
  * (LongValueSum, DoubleValueSum, Long/StringValueMax/Min, UniqValueCount,
  * ValueHistogram) wired via `aggregator.descriptor.N` conf entries
  * (`ValueAggregatorJob.java:215-218`).
  *
  * Here a descriptor is `"AggType:column[:param]"`; `compile` turns a list
  * of them into aggregate columns for `groupBy(key).agg(...)`. Catalyst
  * provides the combiner (partial aggregation) automatically — the
  * reference's `ValueAggregatorCombiner` is free.
  *
  * Cross-engine exactness: DoubleValueSum accumulates in DECIMAL(18,4) and
  * emits one rounded DOUBLE (float accumulation order would differ between
  * engines); UniqValueCount uses documented *sorted*-cap semantics — the
  * reference caps by arrival order (`UniqValueCount.java:81-86`, a TreeMap
  * fed until size exceeds the cap), which is nondeterministic under
  * parallel execution, so we keep the first `cap` values in sorted order
  * instead (deterministic on any cluster; divergence documented per SURVEY
  * §7.4-3).
  */
object Aggregates {

  private val D = DecimalType(18, 4)

  final case class Descriptor(aggType: String, column: String, param: Option[Long])

  def parse(spec: String): Descriptor = spec.split(":").toList match {
    case t :: c :: Nil      => Descriptor(t, c, None)
    case t :: c :: p :: Nil => Descriptor(t, c, Some(p.toLong))
    case _ => sys.error(s"bad aggregate descriptor '$spec' (want AggType:column[:param])")
  }

  /** One descriptor → one aggregate Column (aliased `<aggtype>_<column>`). */
  def toColumn(d: Descriptor): Column = {
    val c = col(d.column)
    val alias = s"${d.aggType.toLowerCase}_${d.column}"
    val agg = d.aggType match {
      case "LongValueSum"   => sum(c.cast("long"))
      case "DoubleValueSum" => round(sum(c.cast(D)), 2).cast("double")
      case "LongValueMax"   => max(c.cast("long"))
      case "LongValueMin"   => min(c.cast("long"))
      case "StringValueMax" => max(c.cast("string"))
      case "StringValueMin" => min(c.cast("string"))
      case "UniqValueCount" =>
        // cap stays a Long: Long.MaxValue.toInt would truncate to -1
        least(count_distinct(c), lit(d.param.getOrElse(Long.MaxValue)))
      case other => sys.error(s"unknown aggregator type '$other'")
    }
    agg.as(alias)
  }

  def compile(specs: Seq[String]): Seq[Column] = specs.map(s => toColumn(parse(s)))

  /** Descriptor-driven aggregation: `groupBy(key).agg(descriptors...)`. */
  def aggregate(df: DataFrame, key: Column, specs: Seq[String]): DataFrame = {
    val cols = compile(specs)
    df.groupBy(key).agg(cols.head, cols.tail: _*)
  }

  /** Capped UniqValueCount with full semantics: capped distinct count plus
    * the first `cap` distinct values in sorted order, comma-joined.
    */
  def uniqValueCount(c: Column, cap: Int): (Column, Column) = (
    least(count_distinct(c), lit(cap.toLong)),
    array_join(slice(sort_array(collect_set(c.cast("string"))), 1, cap), ","))

  /** Huge-cardinality variant (SURVEY §2.4): HyperLogLog sketch instead of
    * an exact distinct — constant memory per group at any cardinality, the
    * only viable distinct count at 100 TB. rsd = relative standard error.
    */
  def uniqApprox(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** ValueHistogram (`ValueHistogram.java:78-134`): per key, the frequency
    * distribution of values, reported as [unique count, min, median, max,
    * mean, population stddev] of the frequencies. Median is the reference's
    * `counts[counts.length / 2]` — the upper-middle element of the sorted
    * frequency array, not an interpolated percentile.
    *
    * Two-stage distributed shape (freq count, then stats over freqs) rather
    * than a map-buffer UDAF: a per-group Map[value, count] buffer is
    * unbounded at 100 TB; two hash aggregations spill and scale. Mean and
    * stddev are derived from exact long moments (Σf, Σf²) with a fixed
    * IEEE op tree, so both engines produce bit-identical doubles.
    */
  /** Shared two-stage histogram pipeline: per-(key, value) frequency count,
    * then per-key stats over the frequencies. `medianAgg` supplies the one
    * column the variants disagree on (exact collected-array middle vs
    * quantile sketch); everything else — including the fixed IEEE op tree
    * for avg/stddev that cross-engine bit-identity depends on — exists
    * exactly once.
    */
  private def histogramReport(df: DataFrame, key: Column, value: Column,
                              medianAgg: Seq[Column],
                              medianOut: Column): DataFrame = {
    val freq = df.groupBy(key.as("k"), value.as("v")).agg(count(lit(1)).as("f"))
    freq.groupBy(col("k"))
      .agg(
        count(lit(1)).as("uniq"),
        (Seq(
          min(col("f")).as("min_f"),
          max(col("f")).as("max_f"),
          sum(col("f")).as("s"),
          sum(col("f") * col("f")).as("ssq")) ++ medianAgg): _*)
      .select(
        col("k"),
        col("uniq"),
        col("min_f"),
        medianOut.as("median_f"),
        col("max_f"),
        (col("s").cast("double") / col("uniq")).as("avg_f"),
        sqrt((col("ssq").cast("double") - col("s").cast("double") * col("s").cast("double") / col("uniq")) / col("uniq"))
          .as("sd_f"))
  }

  def valueHistogram(df: DataFrame, key: Column, value: Column): DataFrame =
    histogramReport(df, key, value,
      medianAgg = Seq(sort_array(collect_list(col("f"))).as("fs")),
      medianOut = element_at(col("fs"), (col("uniq") / 2).cast("int") + 1))

  /** High-cardinality ValueHistogram: same report shape, but the median is
    * `percentile_approx` over the frequencies instead of a collected sorted
    * array. The exact variant's per-key state is O(distinct values of that
    * key) — a key with 10⁸ distinct values would buffer a 10⁸-element array
    * in one aggregation buffer; this one's state is a fixed-size quantile
    * sketch, the only shape that survives 100 TB. Keep [[valueHistogram]]
    * for reference parity (its buffered map matches `ValueHistogram.java`),
    * use this past ~10⁵ distinct values per key.
    */
  def valueHistogramApprox(df: DataFrame, key: Column, value: Column,
                           accuracy: Int = 10000): DataFrame =
    histogramReport(df, key, value,
      medianAgg = Seq(
        percentile_approx(col("f"), lit(0.5), lit(accuracy)).as("fmed")),
      medianOut = col("fmed"))

  /** Self-routing ValueHistogram: exact median for keys with at most
    * `exactCap` distinct values, `percentile_approx` beyond — decided
    * PER KEY inside one plan, so a corpus mixing ordinary keys with one
    * degenerate 10⁸-distinct key needs neither a priori knowledge nor a
    * second pass, and no aggregation buffer ever exceeds `exactCap`.
    *
    * Shape: frequencies are ranked per key by a WINDOW (`WindowExec`
    * spills its per-group buffer to disk, so even the degenerate key
    * degrades to disk bandwidth, never OOM), then one grouped pass
    * collects only the `exactCap` lowest-ranked frequencies (a capped
    * buffer — `collect_list` drops the NULLs the cap condition leaves)
    * alongside a fixed-size quantile sketch of all of them. The exact
    * median index `uniq/2 + 1` only dereferences the capped array when
    * `uniq <= exactCap`, where the array is complete; otherwise the
    * sketch answers. The ranking window shuffles on the key once and the
    * following groupBy reuses that partitioning — same shuffle count as
    * [[valueHistogram]].
    *
    * The routing decision is LOUD, not silent: the report carries a
    * `median_is_approx` flag per key (drop it for reference-shaped
    * output), so a pipeline can count routed keys with one
    * [[Counters.instrument]] aggregate instead of discovering sketchy
    * medians in a postmortem. ScaleSpec drives a 10⁶-distinct key through
    * a small cap; AggregatesSpec pins auto == exact on ordinary data.
    */
  def valueHistogramAuto(df: DataFrame, key: Column, value: Column,
                         exactCap: Int = 100000,
                         accuracy: Int = 10000,
                         detailsTopN: Int = 20): DataFrame = {
    require(exactCap > 0, s"valueHistogramAuto: exactCap must be positive (got $exactCap)")
    require(detailsTopN > 0, s"valueHistogramAuto: detailsTopN must be positive (got $detailsTopN)")
    val freq = df.groupBy(key.as("k"), value.as("v")).agg(count(lit(1)).as("f"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("f"), col("v"))
    // the reference report's item dump (`ValueHistogram.java:134`
    // getReportDetails: every value/frequency pair) rides along as a
    // BOUNDED `details` column: the top-N items by frequency
    // (value-ascending tiebreak) rendered `v:f` comma-joined, with a loud
    // `+k` marker counting the items past the cap — never the reference's
    // unbounded dump, never a silent truncation. Both rankings share the
    // one partition-by-k exchange (two sorts, one shuffle).
    val rankDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("f").desc, col("v"))
    freq
      .withColumn("_rn", row_number().over(rank))
      .withColumn("_dn", row_number().over(rankDesc))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("uniq"),
        min(col("f")).as("min_f"),
        max(col("f")).as("max_f"),
        sum(col("f")).as("s"),
        sum(col("f") * col("f")).as("ssq"),
        sort_array(collect_list(when(col("_rn") <= exactCap, col("f")))).as("fs"),
        sort_array(collect_list(when(col("_dn") <= detailsTopN,
          struct(col("_dn").as("r"), col("v").cast("string").as("v"),
            col("f").cast("string").as("f"))))).as("_items"),
        percentile_approx(col("f"), lit(0.5), lit(accuracy)).as("fmed"))
      .select(
        col("k"),
        col("uniq"),
        col("min_f"),
        when(col("uniq") <= exactCap,
          element_at(col("fs"), (col("uniq") / 2).cast("int") + 1))
          .otherwise(col("fmed")).as("median_f"),
        col("max_f"),
        (col("s").cast("double") / col("uniq")).as("avg_f"),
        sqrt((col("ssq").cast("double") - col("s").cast("double") * col("s").cast("double") / col("uniq")) / col("uniq"))
          .as("sd_f"),
        concat(
          array_join(transform(col("_items"),
            i => concat(i("v"), lit(":"), i("f"))), ","),
          when(col("uniq") > detailsTopN,
            concat(lit(",+"), (col("uniq") - detailsTopN).cast("string")))
            .otherwise(lit(""))).as("details"),
        (col("uniq") > exactCap).as("median_is_approx"))
  }
}
