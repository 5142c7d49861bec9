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

  test("deterministic HLL stays inside the accuracy envelope across regimes") {
    // cardinalities spanning the linear-counting branch (n << m=256),
    // the crossover, and the raw-HLL branch; 3σ at m=256 is ~19.5%,
    // linear counting is far tighter at small n
    for (n <- Seq(10, 100, 500, 2000, 20000)) {
      val df = spark.range(n.toLong).select(
        lit("g").as("grp"), (col("id") * 2654435761L + 12345L).as("k"))
      val est = Sketches.hllCountDistinct(df, col("grp"), col("k"))
        .select(col("hll_est")).as[Long].head()
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.20, s"n=$n est=$est err=$err exceeds the 3-sigma envelope")
    }
  }

  test("deterministic CMS cells sum to N per row and never undercount") {
    val cnt = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(explode(graft.operators.Dedup.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = cnt.agg(sum("cnt")).as[Long].head()
    val cells = Sketches.countMinDeterministic(cnt, "term", "cnt")
    // every hash row partitions the full stream: cells of each i sum to N
    val rowSums = cells.groupBy(col("i")).agg(sum(col("cell")).as("s"))
      .select(col("s")).as[Long].collect()
    assert(rowSums.length == 4 && rowSums.forall(_ == total))
    // point estimates: min over rows >= true count, for every key
    val probes = cnt
      .select(col("term"), col("cnt"),
        explode(array((0 until 4).map(lit): _*)).as("i"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("term"), lit("#"), col("i"))), 1, 8), 16, 10)
          .cast("long") % 1024)
      .join(cells, Seq("i", "bucket"))
      .groupBy(col("term"), col("cnt"))
      .agg(min(col("cell")).as("est"))
    assert(probes.filter(col("est") < col("cnt")).count() == 0)
  }
}
