package graft

import graft.api.GraftJob
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordcount job: tokenize -> countBy") {
    val docs = Seq("a b a", "b c").toDF("text")
    val got = GraftJob.input(docs)
      .tokenize(col("text"))
      .countBy(col("word"))
      .build()
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("fieldsel + keyfield sort job chain") {
    val recs = Seq("3:c:x", "1:a:y", "2:b:z").toDF("line")
    val got = GraftJob.input(recs)
      .fieldSelect(col("line"), ":", "1:0,2")
      .map(d => d.select(concat_ws("\t", col("key"), col("value")).as("line")))
      .sortByKeyFields(col("line"), "\t", "-k1r")
      .build()
      .as[String].collect().toSeq
    assert(got == Seq("c\t3:x", "b\t2:z", "a\t1:y"))
  }

  test("aggregate descriptor job") {
    val ev = Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v")
    val rows = GraftJob.input(ev)
      .aggregateBy(col("k"), "LongValueSum:v", "LongValueMax:v")
      .build().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a", 6L, 5L), ("b", 2L, 2L)))
  }

  test("candidatePairs equals naive all-pairs within buckets") {
    val bands = Seq(
      (1L, 0, "k1"), (2L, 0, "k1"), (3L, 0, "k1"),
      (2L, 1, "k2"), (3L, 1, "k2"),
      (9L, 2, "solo")).toDF("id", "band", "key")
    val got = Dedup.candidatePairs(bands).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("bigrams edge cases: one- and two-token docs") {
    val df = Seq("solo", "two words").toDF("text")
    val got = df.select(col("text"), Dedup.bigrams(col("text")).as("b"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("solo") == Seq.empty)
    assert(got("two words") == Seq("two words"))
  }
}
