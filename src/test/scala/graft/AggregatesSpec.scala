package graft

import graft.functions.TypedAggs.CappedUniq
import graft.operators.Aggregates
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {

  test("descriptor parse") {
    val d = Aggregates.parse("UniqValueCount:user_id:10")
    assert(d.aggType == "UniqValueCount" && d.column == "user_id" && d.param.contains(10L))
    intercept[Exception](Aggregates.parse("nope"))
    intercept[Exception](Aggregates.toColumn(Aggregates.parse("Bogus:x")))
  }

  test("UniqValueCount without a cap returns the full distinct count") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val df = Seq(("g", 1), ("g", 2), ("g", 2), ("g", 3)).toDF("k", "v")
    val got = Aggregates.aggregate(df, lit("g"), Seq("UniqValueCount:v"))
      .collect()(0).getLong(1)
    assert(got == 3L) // regression: Long.MaxValue.toInt == -1 capped everything
  }

  test("valueHistogramAuto == valueHistogram on keys under the exact cap") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(500)((s"k${rnd.nextInt(4)}", rnd.nextInt(20).toLong))
      .toDF("k", "v")
    val exact = Aggregates.valueHistogram(df, col("k"), col("v"))
      .collect().map(_.toSeq).toSet
    val auto = Aggregates.valueHistogramAuto(df, col("k"), col("v"))
    // every key is under the cap: nothing routed, reports identical
    assert(auto.filter(col("median_is_approx")).count() == 0)
    assert(auto.drop("median_is_approx", "details").collect().map(_.toSeq).toSet == exact)
  }

  test("histogram details: top-N by frequency with a loud truncation marker") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // k1: frequencies v=1→3, v=2→2, v=3→1 (three distinct values)
    val df = Seq(("k1", 1L), ("k1", 1L), ("k1", 1L), ("k1", 2L), ("k1", 2L),
      ("k1", 3L)).toDF("k", "v")
    val full = Aggregates.valueHistogramAuto(df, col("k"), col("v"))
      .collect()(0).getAs[String]("details")
    assert(full == "1:3,2:2,3:1") // freq desc, value-asc tiebreak, no marker
    val capped = Aggregates.valueHistogramAuto(df, col("k"), col("v"),
      detailsTopN = 2).collect()(0).getAs[String]("details")
    assert(capped == "1:3,2:2,+1") // cap at 2, loud +1 for the item dropped
  }

  test("CappedUniq result = sorted distinct take cap, any fold/merge order") {
    val agg = new CappedUniq(5)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val vs = List.fill(rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(3)).mkString)
      val folded = vs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = vs.splitAt(if (vs.isEmpty) 0 else rnd.nextInt(vs.size + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val expect = vs.distinct.sorted.take(5)
      assert(folded == expect, s"fold of $vs")
      assert(merged == expect, s"merge of $l / $r")
      val res = agg.finish(folded)
      assert(res.cnt == expect.size && res.items == expect.mkString(","))
    }
  }
}
