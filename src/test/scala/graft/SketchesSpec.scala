package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events =
    spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")

  test("count-min estimates are never under and close to exact counts") {
    val exact = events.groupBy(col("event_type")).count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val cms = Sketches.countMin(events, "event_type", eps = 0.01)
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"$k: CMS must never underestimate ($est < $c)")
      assert(est <= c + (0.01 * n).toLong + 1,
        s"$k: estimate $est beyond the eps*N bound over $c")
    }
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val bf = Sketches.bloom(events.select(col("user_id")), "user_id",
      expectedItems = 1000L, fpp = 0.01)
    val members = events.select(col("user_id")).distinct()
      .as[Long].collect()
    members.foreach(u => assert(bf.mightContainLong(u), s"false negative on $u"))
    // probe ids far outside the member range; allow generous slack on fpp
    val falsePos = (1000000L until 1010000L).count(bf.mightContainLong)
    assert(falsePos <= 10000 * 0.05, s"false-positive rate too high: $falsePos/10000")
  }

  test("bloom prefilter + exact semi-join equals the exact semi-join") {
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val topCustomers = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .filter(col("c_acctbal") > 5000)
    val exact = orders.join(topCustomers,
      orders("o_custkey") === topCustomers("c_custkey"), "left_semi")
      .select(col("o_orderkey")).as[Long].collect().toSet
    val prefiltered = Sketches.bloomSemiFilter(
      orders, col("o_custkey"), topCustomers.select(col("c_custkey")),
      "c_custkey", expectedItems = 1000L)
    // the prefilter may keep fpp extras but NEVER drops a true match
    val kept = prefiltered.select(col("o_orderkey")).as[Long].collect().toSet
    val exactAfter = prefiltered.join(topCustomers,
      prefiltered("o_custkey") === topCustomers("c_custkey"), "left_semi")
      .select(col("o_orderkey")).as[Long].collect().toSet
    assert(exact.subsetOf(kept), "prefilter dropped true matches")
    assert(exactAfter == exact, "prefilter + exact join must equal exact join")
  }
}
