package graft

import graft.operators.Packing
import org.scalatest.funsuite.AnyFunSuite

/** [[Packing]]'s two-pass distributed prefix sum must equal the
  * single-threaded scan regardless of partition count, and the sequence
  * assignment must respect span arithmetic at the boundaries.
  */
class PackingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("offsets equal the single-threaded prefix sum at any partition count") {
    val rnd = new scala.util.Random(101)
    val texts = Seq.fill(500)(Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))
    val expected = texts.map(_.split(" ").length.toLong)
      .scanLeft(0L)(_ + _).init
    for (parts <- Seq(1, 3, 7, 32)) {
      val got = Packing.tokenOffsets(docs(texts), parts)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(got.map(_._1).toSeq === (0L until 500L),
        s"parts=$parts lost or reordered docs")
      assert(got.map(_._2).toSeq === expected, s"parts=$parts offsets wrong")
    }
  }

  test("sequence assignment: exact-fit, straddle, and multi-sequence docs") {
    // seqLen 10: doc0 takes [0,10) exactly, doc1 straddles [10,25),
    // doc2 sits inside [25,27), doc3 spans 3 sequences [27,60)
    val texts = Seq(
      Seq.fill(10)("a").mkString(" "),
      Seq.fill(15)("b").mkString(" "),
      Seq.fill(2)("c").mkString(" "),
      Seq.fill(33)("d").mkString(" "))
    val rows = Packing.packed(docs(texts), 10, parts = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows === Array(
      (0L, 0L, 0L, false),
      (10L, 1L, 2L, true),
      (25L, 2L, 2L, false),
      (27L, 2L, 5L, true)))
  }

  test("sizeOffsets equals the single-threaded prefix sum at any partition count") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31)
    val sizes = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(5000).toLong))
    val df = sizes.toDF("doc_id", "n_chars").repartition(7)
    val expected = sizes.map(_._2).scanLeft(0L)(_ + _).init
    for (parts <- Seq(1, 5, 32)) {
      val got = Packing.sizeOffsets(df, "doc_id", "n_chars", parts)
        .orderBy(col("doc_id")).collect().map(_.getLong(2)).toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("more partitions than rows still works") {
    val got = Packing.tokenOffsets(docs(Seq("x y", "z")), parts = 32)
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(0L, 2L))
  }

  test("runningTotal equals the window running sum at any partition count") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(77)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "v")
      .withColumn("neg", -col("v")) // desc order via negation, the contract
    for (parts <- Seq(1, 3, 32)) {
      val got = Packing.runningTotal(df, Seq("neg", "k"), "v", parts)
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      val want = df.withColumn("cum",
          sum(col("v")).over(Window.orderBy(col("neg"), col("k"))))
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == want, s"diverged at parts=$parts")
    }
  }

  test("runningMax equals the exclusive window max at any partition count") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(91)
    // duplicate values on purpose: the exclusive prefix must treat ties
    // by order position, not value identity
    val df = (1 to 400).map(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("k", "v")
    for (parts <- Seq(1, 3, 32)) {
      val got = Packing.runningMax(df, Seq("k"), "v", parts)
        .select(col("k"), col("cummax_excl")).as[(Long, Option[Long])]
        .collect().toMap
      val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
      val want = df.withColumn("m", max(col("v")).over(w))
        .select(col("k"), col("m")).as[(Long, Option[Long])].collect().toMap
      assert(got == want, s"diverged at parts=$parts")
    }
  }

  test("selectUnderBudget keeps the maximal score-ordered prefix, any partition count") {
    import org.apache.spark.sql.functions.{col, length}
    val rnd = new scala.util.Random(77)
    val texts = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    val df = docs(texts)
    // sequential truth: (score desc = text length desc, doc_id) order
    val ordered = texts.zipWithIndex
      .map { case (t, i) => (t.length.toLong, i.toLong, t.split(" ").length.toLong) }
      .sortBy { case (s, id, _) => (-s, id) }
    val budget = ordered.map(_._3).sum / 3
    var acc = 0L
    val truth = ordered.flatMap { case (_, id, n) =>
      acc += n; if (acc <= budget) Some((id, n, acc)) else None
    }
    for (parts <- Seq(1, 3, 32)) {
      val got = Packing
        .selectUnderBudget(df, length(col("text")), budget, parts)
        .orderBy("cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == truth, s"parts=$parts")
    }
    // a straddling doc is excluded, not truncated; zero budget keeps nothing
    assert(Packing.selectUnderBudget(docs(Seq("a b c")), length(col("text")), 2L)
      .count() == 0)
    assert(Packing.selectUnderBudget(df, length(col("text")), 0L).count() == 0)
  }
}
