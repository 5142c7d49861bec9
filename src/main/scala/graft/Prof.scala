package graft

/** Measurement tool (optimization rounds, guide §1): per-phase wall-clock
  * breakdown of the heavy index lanes (build / save / load / append /
  * serve), plus a per-job listener so each Spark job's seconds and
  * description are visible without the UI. Diagnostic main only — not
  * part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh graft.Prof <lane> [lane...]
  * Lanes: rag_disk, rag_stream, knn_persisted, cc_incremental, ...
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // per-job seconds with descriptions, so phases decompose into jobs
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20)
            System.err.println(f"[prof-job] job ${je.jobId}%4d ${ms}%8.0f ms  $desc")
        }
      }
    })
    def phase[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[prof] PHASE $name%-28s ${sec}%7.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warmup (same as Bench)
    locally {
      import org.apache.spark.sql.functions._
      scala.util.Try {
        val n = spark.read.parquet(s"$sfDir/nation.parquet")
        n.groupBy(col("n_regionkey")).agg(count(lit(1))).collect()
      }
      Seq("lineitem", "orders", "events", "documents").foreach { t =>
        scala.util.Try(
          spark.read.parquet(s"$sfDir/$t.parquet")
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1))).collect())
      }
    }

    args.foreach {
      case "rag_disk" =>
        import org.apache.spark.sql.functions._
        val docs = graft.core.Graft.table(spark, sfDir, "documents")
        val path = graft.core.Graft.scratch("prof_rag_index")
        val idx = phase("rag build")(queries.TextQueries.ragIndexBuildOf(docs))
        phase("rag save")(queries.TextQueries.ragIndexSave(idx, path))
        val loaded = phase("rag load")(queries.TextQueries.ragIndexLoad(spark, path))
        val qt = phase("rag qterms")(
          queries.TextQueries.ragQueryTermsOf(docs, 13L).localCheckpoint(true))
        val qv = phase("rag qvec")(
          queries.TextQueries.ragQueryVectorOf(docs, 13L).localCheckpoint(true))
        val served = phase("rag serve")(
          queries.TextQueries.ragServeDisk(loaded, qt, qv, 20))
        phase("rag serve exec")(drain(served))
      case "rag_build_detail" =>
        import org.apache.spark.sql.functions._
        import graft.operators.Similarity
        val docs = graft.core.Graft.table(spark, sfDir, "documents")
        val ctoks = phase("ctoks (chunk+explode+ckpt)")(
          queries.TextQueries.ragChunkToksOf(docs))
        val tf = phase("tf agg+ckpt")(
          ctoks.groupBy(col("xid"), col("term")).agg(count(lit(1)).as("tf"))
            .localCheckpoint(true))
        val cl = phase("cl agg")(
          ctoks.groupBy(col("xid")).agg(count(lit(1)).as("dl"))
            .localCheckpoint(true))
        val postings = phase("postings join+ckpt")(
          tf.join(cl, "xid").localCheckpoint(true))
        phase("termStats agg+ckpt")(
          postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
            .localCheckpoint(true))
        phase("tot agg")(
          postings.agg(count_distinct(col("xid")).as("nd"),
            sum(col("tf")).as("tt")).localCheckpoint(true))
        val corpus = phase("chunk vectors+ckpt")(
          queries.TextQueries.ragChunkVectors(ctoks).localCheckpoint(true))
        val n = phase("corpus count")(corpus.count())
        val cells = Similarity.ivfCellsFor(n)
        val centroids = phase("centroids+ckpt")(
          corpus.orderBy(col("xid")).limit(cells)
            .select(col("xid").as("cid"), col("xvec").as("cvec"))
            .localCheckpoint(true))
        val stats = phase("sq8 stats collect")(Similarity.sq8StatsOf(corpus))
        phase("encode+assign+ckpt")(
          Similarity.sq8EncodeFrozen(corpus, stats)
            .join(Similarity.cellAssign(corpus, centroids), "xid")
            .localCheckpoint(true))
      case "knn_persisted" =>
        val q = SparkEntry.registry.find(_.name == "q167e_knn_graph_persisted").get
        phase("q167e full")(drain(q.run(spark, sfDir)))
      case name =>
        val q = SparkEntry.registry.find(_.name == name)
          .getOrElse(sys.error(s"unknown lane/query '$name'"))
        phase(name)(drain(q.run(spark, sfDir)))
    }
    spark.stop()
  }
}
