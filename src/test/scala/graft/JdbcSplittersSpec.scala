package graft

import graft.operators.JdbcSplitters
import org.scalatest.funsuite.AnyFunSuite

class JdbcSplittersSpec extends AnyFunSuite {

  test("textSplitPoints: ordered boundaries from min to max, fraction round-trip") {
    val pts = JdbcSplitters.textSplitPoints("apple", "zebra", 4)
    assert(pts.head == "apple" && pts.last == "zebra")
    assert(pts == pts.sorted && pts.distinct == pts)
    assert(pts.size >= 2 && pts.size <= 5)
    // interpolated points stay inside the interval
    assert(pts.forall(p => p >= "apple" && p <= "zebra"))
    // fraction mapping is monotonic, so interpolation preserves order
    val f = (s: String) => JdbcSplitters.toFraction(s, 0)
    assert(f("apple").compareTo(f("zebra")) < 0)
    assert(JdbcSplitters.fromFraction(f("melon")) == "melon")
  }

  test("textSplitPoints honors a shared prefix and degenerate ranges") {
    val pts = JdbcSplitters.textSplitPoints("user_aaa", "user_zzz", 3)
    assert(pts.forall(_.startsWith("user_")))
    assert(JdbcSplitters.textSplitPoints("same", "same", 5) == Seq("same", "same"))
  }

  test("textPredicates: disjoint cover, closed ends, NULLs in first range") {
    val preds = JdbcSplitters.textPredicates("k", "click", "view", 4)
    assert(preds.length >= 2 && preds.length <= 4)
    assert(preds.head.contains("k >= 'click'") && preds.head.contains("k IS NULL"))
    assert(preds.last.contains("k <= 'view'"))
    // interior bounds half-open: every non-final range uses <, so a key
    // equal to a boundary lands in exactly one fragment
    preds.init.foreach(p => assert(p.contains("k < '")))
    assert(preds.tail.forall(!_.contains("IS NULL")))
    // SQL string literals escape embedded quotes
    val esc = JdbcSplitters.textPredicates("k", "o'hara", "o'neil", 1)
    assert(esc.head.contains("'o''hara'"))
  }

  test("property: split points stay ordered inside [min, max] on random keys") {
    val rnd = new scala.util.Random(2026)
    def randKey(): String = {
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString // printable ASCII
    }
    for (_ <- 1 to 300) {
      val a = randKey(); val b = randKey()
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val n = 1 + rnd.nextInt(8)
      val pts = JdbcSplitters.textSplitPoints(lo, hi, n)
      assert(pts.head == lo && pts.last == hi, s"ends for [$lo, $hi] n=$n")
      assert(pts == pts.sorted && pts.distinct == pts, s"order for [$lo, $hi] n=$n")
      assert(pts.size <= n + 1)
      // predicates partition the interval: ranges are adjacent (each
      // range's upper bound is the next range's lower bound)
      val preds = JdbcSplitters.textPredicates("k", lo, hi, n)
      assert(preds.length == pts.size - 1)
    }
  }

  test("property: fraction round trip is exact for printable keys up to 8 chars") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(8)
      val s = (1 to n).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
      assert(JdbcSplitters.fromFraction(JdbcSplitters.toFraction(s, 0)) == s,
        s"round trip of '$s'")
    }
  }

  test("datePredicates: even strides over epoch millis, renderer applied") {
    val render = (ms: Long) => s"TS($ms)"
    val preds = JdbcSplitters.datePredicates("d", 0L, 1000L, 4, render)
    assert(preds.length == 4)
    assert(preds.head == "(d >= TS(0) AND d < TS(250) OR d IS NULL)")
    assert(preds.last == "(d >= TS(750) AND d <= TS(1000))")
    // n larger than the interval collapses to one closed range
    val one = JdbcSplitters.datePredicates("d", 5L, 5L, 3, render)
    assert(one.length == 1 && one.head.contains("d <= TS(5)"))
  }

  test("floatPredicates: even strides, last range closed, full coverage") {
    val preds = JdbcSplitters.floatPredicates("f", 0.0, 1.0, 4)
    assert(preds.length == 4)
    assert(preds.head == "(f >= 0.0 AND f < 0.25 OR f IS NULL)")
    assert(preds.last == "(f >= 0.75 AND f <= 1.0)")
    // coverage: every boundary value lands in exactly one fragment —
    // the reference's last-split gap (FloatSplitter.java:92) would fail
    // the 0.75..1.0 stride here
    def hits(v: Double): Int = preds.count { p =>
      // parse "(f >= a AND f <[=] b ...)" and evaluate
      val m = """\(f >= ([-0-9.E]+) AND f (<=?) ([-0-9.E]+).*\)""".r
      p match {
        case m(a, op, b) =>
          v >= a.toDouble && (if (op == "<=") v <= b.toDouble else v < b.toDouble)
      }
    }
    for (v <- Seq(0.0, 0.1, 0.25, 0.5, 0.74999, 0.75, 0.9, 1.0))
      assert(hits(v) == 1, s"value $v covered ${hits(v)} times")
    // degenerate range: one closed fragment
    val one = JdbcSplitters.floatPredicates("f", 2.5, 2.5, 3)
    assert(one.length == 1 && one.head.contains("f <= 2.5"))
  }

  test("booleanPredicates: value fragments per bounds, NULLs in the first") {
    assert(JdbcSplitters.booleanPredicates("b", min = false, max = true).toSeq ==
      Seq("(b = FALSE OR b IS NULL)", "b = TRUE"))
    assert(JdbcSplitters.booleanPredicates("b", min = true, max = true).toSeq ==
      Seq("(b = TRUE OR b IS NULL)"))
    assert(JdbcSplitters.booleanPredicates("b", min = false, max = false).toSeq ==
      Seq("(b = FALSE OR b IS NULL)"))
  }

  test("oracleRownumQuery: ROWNUM wrapper shape and emulated row window") {
    val inner = "SELECT id, v FROM t ORDER BY id"
    // split 0 and zero-length splits stay unwrapped (reference guard)
    assert(JdbcSplitters.oracleRownumQuery(inner, 0, 10) == inner)
    assert(JdbcSplitters.oracleRownumQuery(inner, 10, 0) == inner)
    val q = JdbcSplitters.oracleRownumQuery(inner, 20, 10)
    assert(q == "SELECT * FROM (SELECT a.*,ROWNUM dbif_rno FROM ( " + inner +
      " ) a WHERE rownum <= 20 + 10 ) WHERE dbif_rno >= 20")
    // emulate Oracle's ROWNUM (1-based, assigned before the outer
    // predicate) over 100 rows: the window admits rows [start,
    // start+length] inclusive — length+1 rows, whose first row overlaps
    // the previous split's LIMIT/OFFSET-equivalent range; the reader's
    // length-bounded stop is what masks it (see the Scaladoc citation)
    val rows = (1 to 100)
    val kept = rows.zipWithIndex
      .map { case (v, i) => (v, i + 1L) } // (value, rownum)
      .filter(_._2 <= 20 + 10)
      .filter(_._2 >= 20)
    assert(kept.map(_._1) == (20 to 30))
  }
}
