package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Pii]]'s span semantics on the cases the q98 corpus can't cover
  * one-by-one: multiple matches per doc, adjacent spans, boundary
  * behavior, and the deliberate syntactic-only IPv4 contract. Counts and
  * redactions are asserted against hand-derived expectations, not the
  * regex re-run, so a pattern edit that shifts a boundary fails here.
  */
class PiiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String): (Int, Int, Int, String) = {
    val r = Seq(text).toDF("t")
      .select(
        Pii.emailCount(col("t")).as("e"),
        Pii.ipv4Count(col("t")).as("i"),
        Pii.phoneCount(col("t")).as("p"),
        Pii.redact(col("t")).as("r"))
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("multiple and adjacent spans all redact") {
    val (e, i, p, r) =
      one("a@b.co c.d+x@e-f.org 1.2.3.4 10.0.0.1 555-123-4567 call 800-555-0100")
    assert((e, i, p) === (2, 2, 2))
    assert(r === "<EMAIL> <EMAIL> <IP> <IP> <PHONE> call <PHONE>")
  }

  test("no PII leaves text untouched") {
    val s = "the quick brown fox 42 times over v2 final"
    assert(one(s) === ((0, 0, 0, s)))
  }

  test("ipv4 is syntactic: out-of-range octets and dotted versions match") {
    val (e, i, _, r) = one("upgraded from 10.256.0.999 and 1.2.3.4000")
    assert(e === 0)
    // 1.2.3.4000: \b(d{1,3}\.){3}d{1,3}\b needs a word boundary after the
    // last octet's 1-3 digits — '400' is followed by '0', so no match.
    assert(i === 1)
    assert(r === "upgraded from <IP> and 1.2.3.4000")
  }

  test("word boundaries keep partial numbers out of phones") {
    // leading digit glued on the left breaks \b; trailing digit breaks \b
    val (_, _, p, r) = one("x1555-123-4567 555-123-45678 but 555-123-4567.")
    assert(p === 1)
    assert(r === "x1555-123-4567 555-123-45678 but <PHONE>.")
  }

  test("email eats its dotted domain before the IP pass can") {
    val (e, i, _, r) = one("ping me at ops@10.2.3.4servers.example.io now")
    assert(e === 1 && i === 0)
    assert(r === "ping me at <EMAIL> now")
  }

  test("redactSql mirrors the column patterns verbatim") {
    // The oracle string is derived from the same vals; if someone inlines
    // a divergent pattern there, this catches it.
    assert(Pii.redactSql("t").contains(Pii.emailRe))
    assert(Pii.redactSql("t").contains(Pii.ipv4Re))
    assert(Pii.redactSql("t").contains(Pii.phoneRe))
    assert("'g'".r.findAllIn(Pii.redactSql("t")).size === 3)
  }
}
