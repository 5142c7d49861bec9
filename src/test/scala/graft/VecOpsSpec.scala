package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector kernels (functions/VecOps.scala): bit parity with the
  * higher-order-function form they replaced, including the null-poison
  * contract (null array / length mismatch / null element → null).
  */
class VecOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("DotLongs matches the HOF dot bit for bit on real embeddings") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = Similarity.scaled(col("embedding"))
    val b = Similarity.scaled(reverse(col("embedding")))
    val diff = emb
      .select(Similarity.dotScaled(a, b).as("native"), hofDot(a, b).as("hof"))
      .filter(col("native") =!= col("hof") ||
        col("native").isNull =!= col("hof").isNull)
      .count()
    assert(diff == 0L, s"$diff rows diverged between native and HOF dot")
  }

  test("null-poison contract: mismatch, null element, null array") {
    import spark.implicits._
    val rows = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),   // clean: 11
      (Some(Seq(1L, 2L)), Some(Seq(3L))),       // length mismatch -> null
      (None, Some(Seq(1L)))                      // null array -> null
    ).toDF("a", "b")
    val got = rows.select(Similarity.dotScaled(col("a"), col("b")).as("d"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(11L), None, None), got.toString)
    // null ELEMENT poisons (matches zip_with's null propagation)
    val withNullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) AS a, array(2L, 3L) AS b")
    assert(withNullElem.select(Similarity.dotScaled(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("L2Longs matches the HOF squared distance on real embeddings") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = Similarity.scaled(col("embedding"))
    val b = Similarity.scaled(reverse(col("embedding")))
    val native = GraftBridge.toColumn(graft.functions.L2Longs(
      GraftBridge.toExpr(a), GraftBridge.toExpr(b)))
    val hof = aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val diff = emb.select(native.as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0L, s"$diff rows diverged between native and HOF l2")
  }
}
