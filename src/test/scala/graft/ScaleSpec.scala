package graft

import graft.operators.{Aggregates, Salt, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path operators: salted skew joins, bucketed shuffle-free SMJ,
  * HLL distinct, distributed search fan-out.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    val large = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
      .toDF("k", "v")
    val small = Seq(("hot", 10), ("a", 20), ("b", 30), ("unmatched", 0))
      .toDF("k", "w")
    val salted = Salt.saltedJoin(large, small, "k", n = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .as[(String, Long, Long)].collect().toSet
    val plain = large.join(small, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(salted.exists { case (k, n, _) => k == "hot" && n == 500 })
  }

  test("data-derived-salt join: hot key fans across lanes, result is exact") {
    // 2000-row hot key with a within-key disambiguator, plus cold keys and
    // an unmatched build row — the q107 production shape in miniature
    val probe = ((1 to 2000).map(i => ("hot", i, i.toLong)) ++
      Seq(("a", 1, 10L), ("b", 1, 20L), ("orphan", 1, 0L)))
      .toDF("k", "line", "v")
    val build = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unmatched", "U"))
      .toDF("k", "tag")
    val salted = Salt.saltedJoin(probe, build, Seq("k"), 8, col("line"))
    val got = salted.groupBy("k", "tag")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .as[(String, String, Long, Long)].collect().toSet
    val want = probe.join(build, Seq("k"), "inner").groupBy("k", "tag")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.exists { case (k, _, n, _) => k == "hot" && n == 2000 })
    // the salt must genuinely split the hot key: >1 distinct lane used
    val lanes = probe.filter(col("k") === "hot")
      .select(pmod(hash(col("line")), lit(8)).as("s"))
      .distinct().count()
    assert(lanes > 1, s"hot key collapsed to $lanes lane(s)")
  }

  test("valueHistogramAuto routes a 10⁶-distinct key to the sketch median") {
    // one degenerate key with 10⁶ distinct values (each frequency 1 or 2)
    // plus an ordinary key: the exact path would buffer a million-element
    // array for the hot key; the auto path must cap the buffer at
    // exactCap and answer its median from the sketch, while the ordinary
    // key still gets the exact median — in the same plan.
    val df = spark.range(0, 1200000).select(
      when(col("id") < 1100000, lit("hot")).otherwise(lit("cold")).as("k"),
      when(col("id") < 1100000, col("id") % 1000000)
        .otherwise(col("id") % 10).as("v"))
    val got = Aggregates
      .valueHistogramAuto(df, col("k"), col("v"), exactCap = 1000)
      .collect().map(r => r.getString(0) -> r).toMap
    val hot = got("hot")
    assert(hot.getAs[Boolean]("median_is_approx"),
      "hot key must route to the sketch median")
    assert(hot.getAs[Long]("uniq") == 1000000L)
    // frequencies are 1 (900k values) and 2 (100k values): any sane
    // median estimate of that distribution is 1
    assert(hot.getAs[Long]("median_f") == 1L)
    val cold = got("cold")
    assert(!cold.getAs[Boolean]("median_is_approx"),
      "ordinary key must keep the exact median")
    assert(cold.getAs[Long]("uniq") == 10L &&
      cold.getAs[Long]("median_f") == 10000L)
  }

  test("bucketed tables sort-merge join without shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("va"))
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join should not shuffle:\n" + plan)
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits skewed join partitions at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~100x the data of the rest
      val left = spark.range(0, 50000)
        .select(when(col("id") % 100 < 99, lit(7L)).otherwise(col("id")).as("k"),
          lpad(col("id").cast("string"), 100, "x").as("pad"))
      val right = spark.range(0, 2000).select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      val aqeRows = joined.collect() // execute THIS QueryExecution so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"), "no skew split in:\n" + plan.take(3000))
      // the SAME hot key through the proactive path: Salt.saltedJoin must
      // produce the identical row multiset AQE's reactive split does.
      // When to prefer which (COVERAGE.md "Skew handling"): AQE when skew
      // is unknown/run-varying (zero code, splits only what it observes at
      // the stage boundary); salting when the skew is structural and known
      // (power-law corpus keys), when retries must route rows identically
      // (data-derived salt, q107), or when one key's partition would blow
      // past executor memory before AQE even gets to observe it.
      val salted = graft.operators.Salt
        .saltedJoin(left, right, "k", n = 8)
        .select(col("k"), col("pad"), col("w")).collect()
      def ms(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .groupBy(identity).view.mapValues(_.length).toMap
      assert(ms(salted) == ms(aqeRows.map(r => org.apache.spark.sql.Row(
        r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("pad")),
        r.getLong(r.fieldIndex("w"))))),
        "salted join diverged from the AQE-split plain join on the same hot key")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q185 whale basket: AQE skew-splits the basket self-join; salting matches exactly") {
    // the one skew shape q185's docstring names: a single order holding
    // ~half the catalog makes the self-join's hot ok-partition carry
    // k(k-1)/2 pair work. Drive it through BOTH remedies — AQE's
    // reactive split and Salt.saltedJoin's proactive lanes — and assert
    // the pair multiset is identical to the plain join's.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // whale order 0: 1000 of the 2000-part catalog; 2000 normal 3-item
      // baskets. pad inflates the whale's shuffle partition past the
      // threshold — max(pad1) in the agg keeps it from being pruned out
      // of the join shuffle.
      val whale = spark.range(0, 1000)
        .select(lit(0L).as("ok"), col("id").as("pk"))
      val normal = spark.range(0, 6000)
        .select((col("id") / 3 + 1).cast("long").as("ok"),
          (col("id") % 2000).as("pk"))
      val bp = whale.unionByName(normal)
        .withColumn("pad", lpad(col("pk").cast("string"), 100, "x"))
      val a = bp.select(col("ok"), col("pk").as("p1"), col("pad").as("pad1"))
      val b = bp.select(col("ok"), col("pk").as("p2"))
      val joined = a.join(b, "ok").filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("co"), max(col("pad1")).as("pad"))
      // collect THIS QueryExecution so AQE finalizes the asserted plan
      def toSet(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val aqeRows = toSet(joined.collect())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "whale basket did not trigger AQE's skew split:\n" + plan.take(3000))
      // proactive path: lanes from the within-key disambiguator (p1), the
      // q107 pattern — same pair multiset, no single-task hot partition
      val salted = toSet(graft.operators.Salt
        .saltedJoin(a, b, Seq("ok"), 8, col("p1"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("co"), max(col("pad1")).as("pad"))
        .collect())
      assert(salted == aqeRows,
        "salted basket self-join diverged from the AQE-split plain join")
      // the whale's own pairs are all present exactly once
      assert(aqeRows.count { case (p1, p2, _, _) => p1 < 1000 && p2 < 1000 } >= 1000 * 999 / 2)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("approx histogram matches exact on a high-cardinality key") {
    // one key with 20k distinct values: the exact variant buffers a
    // 20k-element array per key; the approx variant's state is a
    // fixed-size sketch. Reports must agree on every non-median stat and
    // land close on the median.
    val df = spark.range(0, 20000)
      .select(lit("hot").as("k"), col("id").as("v"))
      .unionAll(spark.range(0, 5)
        .select(lit("cold").as("k"), (col("id") % 2).as("v")))
    val exact = Aggregates.valueHistogram(df, col("k"), col("v"))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Aggregates.valueHistogramApprox(df, col("k"), col("v"))
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (k <- Seq("hot", "cold")) {
      val (e, a) = (exact(k), approx(k))
      assert((e._2, e._3, e._5, e._6, e._7) == (a._2, a._3, a._5, a._6, a._7))
      assert(math.abs(e._4 - a._4) <= 1, s"median drift on $k")
    }
    // the approx plan must NOT collect per-key frequency arrays
    val plan = Aggregates.valueHistogramApprox(df, col("k"), col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"))
  }

  test("approx distinct lands within rsd of exact") {
    val df = spark.range(0, 20000).select((col("id") % 5000).as("v"))
    val approx = df.agg(Aggregates.uniqApprox(col("v"), 0.05)).head().getLong(0)
    assert(math.abs(approx - 5000) < 5000 * 0.15, s"approx=$approx")
  }

  test("distributed n-queens fan-out finds all 92 solutions for n=8") {
    assert(Search.nQueensCount(spark, 8) == 92L)
  }

  test("n-queens degenerate sizes (empty fan-out falls back to local solve)") {
    assert(Search.nQueensCount(spark, 1) == 1L)
    assert(Search.nQueensCount(spark, 2) == 0L)
    assert(Search.nQueensCount(spark, 3) == 0L)
  }

  test("decontamination index past the broadcast cap degrades to a shuffled join") {
    import graft.queries.TextQueries
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // -1 so Catalyst can't silently re-broadcast the uncapped side: the
      // fallback path must complete as a genuinely shuffled join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fallback = TextQueries.decontaminationHits(docs, 8, maxBroadcastGrams = 0)
      val plan = fallback.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "oversized gram index must not broadcast:\n" + plan.take(3000))
      assert(!plan.contains("BroadcastHashJoin"), plan.take(3000))
      val viaShuffle = fallback.as[(Long, Long)].collect().toSet
      val viaBroadcast = TextQueries.decontaminationHits(docs, 8)
        .as[(Long, Long)].collect().toSet
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ivf serves queries that are NOT corpus members") {
    import graft.operators.Similarity
    val corpus = spark.range(0, 100)
      .select(col("id").as("xid"),
        array((0 until 8).map(d => (col("id") % 10 + d).cast("float") / 10f): _*).as("xvec"))
    val centroids = corpus.filter(col("xid") < 4)
      .select(col("xid").as("cid"), col("xvec").as("cvec"))
    val queries = spark.range(1000, 1002) // ids outside the corpus
      .select(col("id").as("qid"),
        array((0 until 8).map(d => lit(0.3f + d / 10f)): _*).as("qvec"))
    val got = Similarity.ivfTopK(queries, corpus, centroids, nProbe = 2, k = 3)
    assert(got.count() > 0) // regression: probe join on corpus ids returned nothing
  }
}
