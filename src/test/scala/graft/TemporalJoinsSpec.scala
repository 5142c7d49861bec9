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
