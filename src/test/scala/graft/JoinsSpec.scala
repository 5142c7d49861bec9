package graft

import graft.operators.Joins
import graft.operators.Joins.{Op, Tbl}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics mirror `src/test/org/apache/hadoop/mapred/join/TestDatamerge.java`:
  * multiple keyed sources, duplicate keys (cross product), per-position
  * null-vs-absent in outer, rightmost-wins in override.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(rows: (Int, String)*) =
    Joins.source(rows.toDF("k", "x"), col("k"), col("x"))

  test("expression parser handles nesting") {
    val e = Joins.parse("outer(inner(tbl(a),tbl(b)),tbl(c))")
    assert(e == Op("outer", Seq(Op("inner", Seq(Tbl("a"), Tbl("b"))), Tbl("c"))))
  }

  test("parser rejects unknown ops and trailing junk") {
    intercept[Exception](Joins.parse("cross(tbl(a),tbl(b))"))
    intercept[Exception](Joins.parse("inner(tbl(a),tbl(b))x"))
  }

  test("inner emits only keys present in all sources, cross product on dups") {
    val a = src(1 -> "a1", 2 -> "a2", 2 -> "a2b")
    val b = src(2 -> "b2", 3 -> "b3")
    val got = Joins.inner(a, b).select($"k", $"v.v0", $"v.v1")
      .as[(Int, String, String)].collect().toSet
    assert(got == Set((2, "a2", "b2"), (2, "a2b", "b2")))
  }

  test("outer keeps per-source null-vs-absent") {
    val a = src(1 -> "a1", 2 -> "a2")
    val b = src(2 -> "b2", 3 -> "b3")
    val got = Joins.outer(a, b).select($"k", $"v.v0", $"v.v1")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1, Some("a1"), None), (2, Some("a2"), Some("b2")), (3, None, Some("b3"))))
  }

  test("override takes the rightmost source holding the key") {
    val a = src(1 -> "a1", 2 -> "a2", 3 -> "a3")
    val b = src(2 -> "b2")
    val c = src(3 -> "c3")
    val got = Joins.run("override(tbl(a),tbl(b),tbl(c))",
      Map("a" -> a, "b" -> b, "c" -> c))
      .as[(Int, String)].collect().toSet
    assert(got == Set(1 -> "a1", 2 -> "b2", 3 -> "c3"))
  }

  test("3-way outer with a key missing from the middle source") {
    val a = src(1 -> "a1")
    val b = src(2 -> "b2")
    val c = src(1 -> "c1", 2 -> "c2")
    val got = Joins.outer(a, b, c).select($"k", $"v.v0", $"v.v1", $"v.v2")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1, Some("a1"), None, Some("c1")),
      (2, None, Some("b2"), Some("c2"))))
  }
}
