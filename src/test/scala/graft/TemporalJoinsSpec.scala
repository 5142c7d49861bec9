package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf picks the latest ref at or before each probe, per key") {
    val probes = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 100L, "p3"))
      .toDF("k", "t", "p")
    val refs = Seq((1L, 40L, "r40"), (1L, 100L, "r100"), (1L, 120L, "r120"),
      (2L, 999L, "rlate")).toDF("k", "t", "r")
    val got = TemporalJoins.asOf(
      probes, col("k"), col("t"), refs, col("k"), col("t"))
      .select(col("p"), col("matched.r").as("r"))
      .as[(String, Option[String])].collect().toMap
    // p1: equal timestamp matches (<= semantics); p2: earlier ref wins;
    // p3: the key's only ref is later -> no match
    assert(got == Map("p1" -> Some("r100"), "p2" -> Some("r40"), "p3" -> None))
  }

  test("asOf never crosses keys and survives ref-free keys") {
    val probes = Seq((7L, 10L, "a"), (8L, 10L, "b")).toDF("k", "t", "p")
    val refs = Seq((7L, 5L, "r7")).toDF("k", "t", "r")
    val got = TemporalJoins.asOf(
      probes, col("k"), col("t"), refs, col("k"), col("t"))
      .select(col("p"), col("matched.r").as("r"))
      .as[(String, Option[String])].collect().toMap
    assert(got == Map("a" -> Some("r7"), "b" -> None))
  }

  test("asOf never matches NULL-keyed or NULL-timed refs, like an ASOF join") {
    val probes = Seq((1L, 10L, "p")).toDF("k", "t", "p")
    val refs = Seq(
      (Option.empty[Long], Option(5L), "nullKey"),
      (Option(1L), Option.empty[Long], "nullTime"),
      (Option(1L), Option(3L), "real")).toDF("k", "t", "r")
    val got = TemporalJoins.asOf(
      probes, col("k"), col("t"), refs, col("k"), col("t"))
      .select(col("matched.r")).as[Option[String]].collect().toList
    // the NULL-keyed and NULL-timed refs are invisible; only "real" matches
    assert(got == List(Some("real")))
  }

  test("asOf keeps NULL-keyed probes (matched=NULL) without windowing them") {
    // range-backed (not a LocalRelation) so the optimizer can't fold the
    // NULL-key guard away before the plan assertion below sees it
    val probes = spark.range(0, 2).select(
      when(col("id") === 0, lit(1L)).as("k"), lit(10L).as("t"),
      when(col("id") === 0, lit("p")).otherwise(lit("pnull")).as("p"))
    val refs = Seq((1L, 5L, "r")).toDF("k", "t", "r")
    val joined = TemporalJoins.asOf(
      probes, col("k"), col("t"), refs, col("k"), col("t"))
    val got = joined.select(col("p"), col("matched.r").as("r"))
      .as[(String, Option[String])].collect().toMap
    // a NULL-keyed probe row is kept (left semantics) but can never match
    assert(got == Map("p" -> Some("r"), "pnull" -> None))
    // and it must not ride through the window: NULL-keyed probes take a
    // separate union branch with NO Window in it, so a null-heavy left
    // side can't pile into one straggler window partition. (The exact
    // NULL-key guard predicate is optimizer-rewritten — e.g. isnotnull of
    // a CASE folds into the CASE's condition — so assert the SPLIT shape,
    // not the expression.)
    val plan = joined.queryExecution.optimizedPlan
    val topUnion = plan.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.getOrElse(fail(s"expected a top-level Union in the asOf plan:\n$plan"))
    def hasWindow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty
    assert(topUnion.children.exists(hasWindow),
      s"expected a windowed branch, plan:\n$plan")
    assert(topUnion.children.exists(!hasWindow(_)),
      s"expected a window-free NULL-probe branch, plan:\n$plan")
  }

  /** q69's oracle (DuckDB ASOF JOIN) leaves its pick among equal-timestamp
    * right rows UNSPECIFIED, while our asOf resolves ties to the struct
    * max, deterministically. The hash compare is therefore only sound
    * while the events corpus has no duplicate (user_id, us) among clicks —
    * assert that invariant on the real fixtures so a data-gen change fails
    * HERE, loudly, instead of flaking the q69 hash.
    */
  test("q69 data invariant: clicks are tie-free per (user_id, us)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/events.parquet").exists) {
        val ev = graft.core.Graft.table(spark, dir, "events")
        val dups = ev
          .filter(col("event_type") === "click")
          .groupBy(col("user_id"), graft.core.Graft.tsUs(ev))
          .count().filter(col("count") > 1).count()
        assert(dups == 0L,
          s"$sf: $dups duplicate (user_id, us) click rows — q69's oracle " +
            "ASOF tie-break is unspecified; the hash compare would flake")
      }
    }
  }

  test("overlapJoin equals the naive inequality join, each pair exactly once") {
    // edge cases on purpose: touching endpoints (overlap 0), containment,
    // identical intervals, a LONG interval spanning many buckets (the
    // canonical-bucket rule must not double-emit), malformed end < start
    // dropped, zero-length points
    val a = Seq(
      ("a1", 0L, 10L), ("a2", 5L, 5L), ("a3", 10L, 20L),
      ("a4", 0L, 95L),   // spans 10 buckets of width 10
      ("a5", 50L, 40L)). // malformed: never matches
      toDF("aid", "s", "e")
    val b = Seq(
      ("b1", 10L, 12L),  // touches a1/a3, inside a4
      ("b2", 3L, 7L), ("b3", 0L, 95L), ("b4", 200L, 210L)).
      toDF("bid", "s", "e")
    val got = TemporalJoins.overlapJoin(a, col("s"), col("e"),
        b, col("s"), col("e"), bucketUs = 10L)
      .select(col("a.aid"), col("b.bid"), col("overlap_"))
      .as[(String, String, Long)].collect().toSeq
    val naive = a.filter(col("e") >= col("s")).select(col("aid"), col("s").as("sa"), col("e").as("ea"))
      .crossJoin(b.select(col("bid"), col("s").as("sb"), col("e").as("eb")))
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("aid"), col("bid"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb"))).as("ov"))
      .as[(String, String, Long)].collect().toSeq
    assert(got.sorted == naive.sorted, s"got $got vs naive $naive")
    assert(got.size == got.distinct.size, "a pair was emitted twice")
    assert(got.contains(("a1", "b1", 0L)), "touching endpoints must match with overlap 0")
    assert(got.contains(("a4", "b3", 95L)), "long co-spanning intervals must match once")
    assert(!got.exists(_._1 == "a5"), "malformed interval must never match")
  }

  test("operators reject inputs whose columns collide with staging names") {
    val bad = Seq((1L, 2L, "x")).toDF("k", "t", "_m")
    val ok = Seq((1L, 2L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOf(ok, col("k"), col("t"), bad, col("k"), col("t"))
    }
    assert(e.getMessage.contains("_m"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.withinGap(
        Seq((1L, 2L, 3L)).toDF("k", "t", "_bkt"), col("k"), col("t"),
        ok, col("k"), col("t"), gap = 10L)
    }
    assert(e2.getMessage.contains("_bkt"))
  }

  test("withinGap honors the boundary exactly and finds cross-bucket pairs") {
    // gap=10: pairs land same-bucket and cross-bucket; diff 0 and diff 11
    // must be excluded, diff exactly 10 included
    val ev = Seq((1L, 0L, "e0"), (1L, 8L, "e8"), (1L, 10L, "e10"),
      (1L, 19L, "e19"), (1L, 30L, "e30"), (2L, 9L, "x9"), (2L, 9L, "y9"))
      .toDF("k", "t", "id")
    val got = TemporalJoins.withinGap(
      ev, col("k"), col("t"), ev, col("k"), col("t"), gap = 10L)
      .select(col("a.id"), col("b.id"), col("gap_"))
      .as[(String, String, Long)].collect().toList
    // each true pair exactly ONCE (collect as a list: a dup would differ),
    // diff 0 (the two t=9 events of key 2) and diff 11 (e19->e30) excluded
    assert(got.sorted == List(
      ("e0", "e10", 10L), // boundary: exactly gap, cross-bucket
      ("e0", "e8", 8L),   // same bucket
      ("e10", "e19", 9L),
      ("e8", "e10", 2L))) // cross-bucket
  }
}
