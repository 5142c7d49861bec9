package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-keyed join operators Spark has no native form of: point-in-time
  * (as-of) lookup and bounded-gap (range) pairing. Both are expressed as
  * equi-shuffle plans — the as-of as one partitioned window over a tagged
  * union, the range join as a bucketed band join — so neither ever plans a
  * cartesian or per-row inequality probe, the shapes that die first at
  * 100 TB.
  */
object TemporalJoins {

  /** The operators stage inputs under internal column names; an input that
    * already uses one would silently shadow or ambiguously resolve — fail
    * loudly instead.
    */
  private def requireNoReserved(df: DataFrame, who: String, reserved: String*): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$who: input columns ${clash.mkString(", ")} collide with reserved names; rename them first")
  }

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTime <= leftTime` among rows sharing the join key — the
    * point-in-time lookup (a streaming system would call it a temporal
    * table join). Returns the left columns plus a `matched` struct of the
    * right row, NULL when no right row precedes the left one (filter
    * `matched IS NOT NULL` for inner semantics).
    *
    * Shape: tag both inputs, union, ONE window per key ordered by time
    * carrying `last(right-row, ignoreNulls)` — a single shuffle on the key
    * and a linear per-key scan. The naive alternative (join on key +
    * inequality, rank per left row) explodes to |left| × |right-per-key|
    * intermediate rows; this stays |left| + |right|. At equal timestamps
    * the right row sorts FIRST, so `rightTime == leftTime` matches
    * (`<=`, the ASOF convention).
    *
    * Times are compared as integral values (cast to long) — callers pick
    * one clock resolution for both sides; sub-resolution components must
    * already be truncated identically (see the q68 micros convention).
    * NULL-keyed or NULL-timed right rows never match (ASOF convention —
    * an equi-join would drop them); ties among right rows at the same
    * (key, time) resolve to the row-struct maximum, deterministically.
    *
    * NULL-keyed LEFT rows can only ever yield matched=NULL, yet
    * `partitionBy(_k)` hashes every NULL key into ONE window partition —
    * a null-heavy left side would funnel through a single straggler task.
    * They are routed AROUND the window (emitted directly with
    * matched=NULL, unioned after), costing a second pushed-down scan of
    * the left side instead of an unbounded skew partition.
    */
  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column): DataFrame = {
    requireNoReserved(left, "asOf left", "_k", "_t", "_m", "_p", "matched")
    requireNoReserved(right, "asOf right", "_k", "_t", "_m", "_p")
    val refs = right.select(
      rightKey.as("_k"), rightTime.cast("long").as("_t"),
      struct(right.columns.map(col): _*).as("_m"))
      .filter(col("_k").isNotNull && col("_t").isNotNull)
    val probes = left.select(
      leftKey.as("_k"), leftTime.cast("long").as("_t"),
      lit(null).cast(refs.schema("_m").dataType).as("_m"),
      struct(left.columns.map(col): _*).as("_p"))
    val tagged = refs
      .withColumn("_p", lit(null).cast(probes.schema("_p").dataType))
      .unionByName(probes.filter(col("_k").isNotNull))
    // refs order before probes at the same instant (false < true); _m
    // breaks ref-vs-ref ties so `last` is deterministic under any shuffle
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_p").isNotNull, col("_m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched", last(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_p").isNotNull)
      .select(col("_p"), col("matched"))
      .unionByName(probes.filter(col("_k").isNull)
        .select(col("_p"), col("_m").as("matched")))
      .selectExpr("_p.*", "matched")
  }

  /** Bounded-gap range join: every pair (a from left, b from right) with
    * the same key and `0 < b.time - a.time <= gap`. Returns structs `a`
    * and `b` of the full input rows plus `gap_` (the time delta).
    *
    * Shape: time is bucketed by `gap`; a qualifying b lies in a's bucket
    * or the next one, so the right side explodes to its two candidate
    * buckets and the join is a plain equi-join on (key, bucket) with the
    * exact window test as a post-filter. Each true pair matches exactly
    * once (b's two probe buckets are distinct), so no dedup pass. Output
    * is bounded by true-pair count + same-bucket candidates — never the
    * per-key cross product a raw inequality join plans — and bucket-count
    * skew is bounded by events-per-gap-window, which AQE's skew splitting
    * handles like any hot equi-join key.
    */
  def withinGap(left: DataFrame, leftKey: Column, leftTime: Column,
                right: DataFrame, rightKey: Column, rightTime: Column,
                gap: Long): DataFrame = {
    require(gap > 0, s"withinGap: gap must be positive (got $gap)")
    requireNoReserved(left, "withinGap left", "_k", "_ta", "_tb", "_bkt", "a", "b", "gap_")
    requireNoReserved(right, "withinGap right", "_k", "_ta", "_tb", "_bkt", "a", "b", "gap_")
    val a = left.select(
      leftKey.as("_k"), leftTime.cast("long").as("_ta"),
      struct(left.columns.map(col): _*).as("a"))
      .withColumn("_bkt", expr(s"_ta div ${gap}L"))
    val b = right.select(
      rightKey.as("_k"), rightTime.cast("long").as("_tb"),
      struct(right.columns.map(col): _*).as("b"))
      .withColumn("_bkt", explode(expr(s"array(_tb div ${gap}L - 1L, _tb div ${gap}L)")))
    a.join(b, Seq("_k", "_bkt"))
      .filter(col("_tb") > col("_ta") && col("_tb") - col("_ta") <= gap)
      .select(col("a"), col("b"), (col("_tb") - col("_ta")).as("gap_"))
  }

  /** Interval OVERLAP join: every (left, right) pair of closed intervals
    * with `leftStart <= rightEnd && rightStart <= leftEnd` — the
    * ranges×ranges generalization of [[withinGap]]'s point-gap pairing
    * (maintenance windows × sessions, incidents × activity spans).
    * Returns `a`/`b` row structs plus `overlap_` = `min(ends) −
    * max(starts)` (0 for touching endpoints).
    *
    * Shape: each interval explodes to the fixed-width time buckets it
    * covers (`len/bucketUs + 1` rows — size `bucketUs` to the typical
    * interval length so the blow-up stays ~2×), candidates meet by
    * bucket equi-join, and the exact predicate filters. A pair of long
    * intervals shares MANY buckets, so emission is restricted to the
    * canonical bucket containing `max(starts)` — two overlapping
    * intervals both cover the later start by definition, so every
    * overlapping pair is emitted exactly once and there is NO distinct
    * pass over the output. Never a cartesian, never a per-row
    * inequality probe.
    *
    * Rows with a NULL endpoint or `end < start` never match (the
    * bucket sequence is NULL/undefined for them — the inequality-join
    * convention for malformed intervals).
    */
  def overlapJoin(left: DataFrame, leftStart: Column, leftEnd: Column,
                  right: DataFrame, rightStart: Column, rightEnd: Column,
                  bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"overlapJoin: bucketUs must be positive (got $bucketUs)")
    requireNoReserved(left, "overlapJoin left", "_sa", "_ea", "_sb", "_eb", "_bkt", "a", "b", "overlap_")
    requireNoReserved(right, "overlapJoin right", "_sa", "_ea", "_sb", "_eb", "_bkt", "a", "b", "overlap_")
    val a = left.select(
      leftStart.cast("long").as("_sa"), leftEnd.cast("long").as("_ea"),
      struct(left.columns.map(col): _*).as("a"))
      .filter(col("_ea") >= col("_sa"))
      .withColumn("_bkt",
        explode(expr(s"sequence(_sa div ${bucketUs}L, _ea div ${bucketUs}L)")))
    val b = right.select(
      rightStart.cast("long").as("_sb"), rightEnd.cast("long").as("_eb"),
      struct(right.columns.map(col): _*).as("b"))
      .filter(col("_eb") >= col("_sb"))
      .withColumn("_bkt",
        explode(expr(s"sequence(_sb div ${bucketUs}L, _eb div ${bucketUs}L)")))
    a.join(b, Seq("_bkt"))
      .filter(col("_sa") <= col("_eb") && col("_sb") <= col("_ea"))
      .filter(col("_bkt") === expr(s"greatest(_sa, _sb) div ${bucketUs}L"))
      .select(col("a"), col("b"),
        (least(col("_ea"), col("_eb")) -
          greatest(col("_sa"), col("_sb"))).as("overlap_"))
  }
}
