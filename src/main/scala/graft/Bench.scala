package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line. A failing query reports an explicit "err" marker (and a
  * sentinel -1 timing) instead of masquerading as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scan/agg/join paths so the first measured query
    // isn't charged for JIT + classloading (~5s on a cold session)
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.groupBy(col("n_regionkey"))
        .agg(sum(col("n_nationkey").cast(DecimalType(18, 4))), count(lit(1)))
        .collect()
      n.join(n.select(col("n_nationkey").as("k")), col("n_nationkey") === col("k"))
        .count()
      // touch the big fact/doc scans too: the first query over each file
      // otherwise pays its parquet-footer + column-reader JIT inside the
      // measured window (q01 was ~1.4s warmup + ~0.3s compute)
      Seq("lineitem", "orders", "events", "documents").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").agg(count(lit(1))).collect()
      }
    }
    // fixed-work CPU calibration (single-thread xorshift): query seconds
    // divided by this constant are comparable across rounds even when the
    // host is contended (observed: 10% steal + forced idle turns the same
    // binary 3x slower) — same work every run, so it moves with the noise.
    // Sampled BEFORE and AFTER the query loop: contention arriving
    // mid-bench shows up as pre/post divergence, not silently.
    def calibMs: Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    val calibPre = calibMs
    val errs = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      val ok =
        // execute the query's OWN physical plan (toRdd) — a .count() would
        // let Catalyst prune projections/regex work out of map-only
        // queries and time a metadata count instead
        try { q.run(spark, sfDir).queryExecution.toRdd.count(); true }
        catch {
          case e: Throwable =>
            errs += q.name
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            false
        }
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibPost = calibMs
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"calib_spin_ms":$calibPre,"calib_spin_ms_post":$calibPost,"sf":"$sfDir"}""")
    spark.stop()
  }
}
