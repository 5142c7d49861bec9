package graft

import graft.operators.{Chain, Counters, Multimodal, SecondarySort}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counters facade observes record counts and custom aggregates") {
    val df = Counters.instrument(
      Seq(1, 2, 3, 4).toDF("v"),
      "SUM_V" -> sum(col("v")))
    df.collect()
    val m = Counters.lastObserved(df)
    assert(m("RECORDS") == 4L && m("SUM_V") == 10L)
  }

  test("chain composes transforms left-to-right (fused, no extra I/O)") {
    val f = Chain.chain(
      (d: org.apache.spark.sql.DataFrame) => d.withColumn("v2", col("v") * 2),
      d => d.filter(col("v2") > 2),
      d => d.select(col("v2")))
    val got = f(Seq(1, 2, 3).toDF("v")).as[Int].collect().sorted.toSeq
    assert(got == Seq(4, 6))
  }

  test("multimodal frame sampling slices deterministic frames") {
    val df = Seq("abcdefghijklmnopqrstuvwxyz0123456789").toDF("t")
    val got = df.select(
      Multimodal.frameSample(encode(col("t"), "UTF-8"), 16, 4, 3).as("f"))
      .as[Seq[String]].head()
    // len 36 → strides at offsets 0, 16, 32: "abcd", "qrst", "6789"
    assert(got == Seq("61626364", "71727374", "36373839"))
  }

  test("sorted groups stream values in secondary order") {
    val df = Seq((1, 3, "c"), (1, 1, "a"), (2, 5, "z"), (1, 2, "b"))
      .toDF("k", "s", "v")
    val got = SecondarySort.sortedGroups[(Int, String)](
      df, col("k"), Seq(col("s")))(_.getInt(0)) { (k, rows) =>
      (k.asInstanceOf[Int], rows.map(_.getString(2)).mkString)
    }.collect().toMap
    assert(got == Map(1 -> "abc", 2 -> "z"))
  }
}
