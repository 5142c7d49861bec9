package graft

import graft.operators.{Aggregates, FieldSelection, Joins, KeyFieldSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Negative + fuzz coverage for the DSL parsers: malformed input must fail
  * fast (never hang or mis-parse silently).
  */
class ParserEdgeSpec extends AnyFunSuite {

  test("field-selection rejects garbage, accepts empty") {
    intercept[Exception](FieldSelection.parse("a,b"))
    intercept[Exception](FieldSelection.parse("1-2-3"))
    assert(FieldSelection.parse("").key.isEmpty)
    assert(FieldSelection.parse(":").key.isEmpty)
    assert(FieldSelection.parse(":").value.isEmpty)
  }

  test("keyfield parse ignores non -k noise, handles repeated specs") {
    assert(KeyFieldSpec.parse("").isEmpty)
    assert(KeyFieldSpec.parse("-t,").isEmpty)
    val ks = KeyFieldSpec.parse("-k1 -k2n -k3.2,3.4r")
    assert(ks.map(_.startField) == Seq(1, 2, 3))
    assert(ks(2).startChar == 2 && ks(2).endChar.contains(4) && ks(2).reverse)
  }

  test("join expression parser terminates and fails fast on malformed input") {
    for (bad <- Seq("", "inner", "inner(", "inner()", "tbl", "inner(tbl(a)",
      "inner(tbl(a),)", ")(", "outer(tbl(a)))")) {
      intercept[Exception](Joins.parse(bad))
    }
    // deep nesting parses without stack issues
    val deep = (1 to 50).foldLeft("tbl(x)")((acc, _) => s"inner($acc,tbl(y))")
    assert(Joins.parse(deep) != null)
  }

  test("aggregate descriptors reject malformed and unknown specs") {
    for (bad <- Seq("", "OnlyType", "a:b:c:d", "LongValueSum:v:notanum")) {
      intercept[Exception] {
        val d = Aggregates.parse(bad); Aggregates.toColumn(d)
      }
    }
  }
}
