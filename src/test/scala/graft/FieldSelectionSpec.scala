package graft

import graft.operators.FieldSelection
import graft.operators.FieldSelection.{Closed, Open, Single}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Spec cases mirror `FieldSelectionHelper.java:40-52` examples. */
class FieldSelectionSpec extends AnyFunSuite {

  test("parse '6,5,1-3:0-'") {
    val s = FieldSelection.parse("6,5,1-3:0-")
    assert(s.key == Seq(Single(6), Single(5), Closed(1, 3)))
    assert(s.value == Seq(Open(0)))
  }

  test("parse key-only and empty sides") {
    assert(FieldSelection.parse("2").key == Seq(Single(2)))
    assert(FieldSelection.parse("2").value.isEmpty)
    assert(FieldSelection.parse(":4-").key.isEmpty)
    assert(FieldSelection.parse(":4-").value == Seq(Open(4)))
  }

  test("project selects, reorders and re-joins fields") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("a-b-c-d-e", "x-y-z").toDF("line")
    val (k, v) = FieldSelection.project(col("line"), "-", "2,0:3-")
    val rows = df.select(k.as("k"), v.as("v")).as[(String, String)].collect().toMap
    assert(rows("c-a") == "d-e")
    assert(rows("z-x") == "") // fields 3.. absent on the short record
  }

  test("reference example: '6,5,1-3:0-' key fields and open-range value") {
    val spark = TestSpark.spark
    import spark.implicits._
    // FieldSelectionHelper.java:40-52 example over fields 0..6
    val df = Seq("f0-f1-f2-f3-f4-f5-f6").toDF("line")
    val (k, v) = FieldSelection.project(col("line"), "-", "6,5,1-3:0-")
    val row = df.select(k.as("k"), v.as("v")).as[(String, String)].head()
    assert(row._1 == "f6-f5-f1-f2-f3")
    assert(row._2 == "f0-f1-f2-f3-f4-f5-f6")
  }

  test("out-of-range single fields are skipped (short records)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("p-q").toDF("line")
    val (k, _) = FieldSelection.project(col("line"), "-", "0,5,1:")
    assert(df.select(k).as[String].head() == "p-q")
  }
}
