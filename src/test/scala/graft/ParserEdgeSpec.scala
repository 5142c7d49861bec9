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

  test("record-DDL parser edge cases: empty shapes and malformed input") {
    import graft.core.RecordDDL
    // empty module and field-less class are legal
    assert(RecordDDL.parse("module m { }") ==
      Vector(RecordDDL.Module("m", Vector.empty)))
    val empty = RecordDDL.parse("module m { class E { } }")
    assert(empty.head.classes.head._2.isEmpty)
    // whitespace-liberal generics
    val spaced = RecordDDL.schemas(
      "module m { class S { vector < map < int , long > > x ; } }")("S")
    assert(spaced("x").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType)))
    // malformed inputs fail fast, never hang or mis-parse
    for (bad <- Seq(
      "module m { class A { int x } }",          // missing semicolon
      "module m { class A { vector<int x; } }",  // unclosed generic
      "class A { int x; }",                      // no module wrapper
      "module m { class A { int x; }"))          // unclosed brace
      intercept[Exception](RecordDDL.parse(bad))
  }

  test("stream-CLI tokenizer edge cases") {
    import graft.api.StreamJob.tokenize
    assert(tokenize("") == Seq.empty)
    assert(tokenize("   ") == Seq.empty)
    // adjacent quoted segments concatenate within one token (shell-like)
    assert(tokenize("a'b c'd") == Seq("ab cd"))
    // alternating quote styles
    assert(tokenize("sh -c 'echo \"a b\"'") ==
      Seq("sh", "-c", "echo \"a b\""))
    // unterminated quote: rest of string becomes the token (no hang)
    assert(tokenize("cmd 'open ended") == Seq("cmd", "open ended"))
  }
}
