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
        val cl = phase("cl agg (from tf)")(
          tf.groupBy(col("xid")).agg(sum(col("tf")).as("dl"))
            .localCheckpoint(true))
        val postings = phase("postings join+ckpt")(
          tf.join(cl, "xid").localCheckpoint(true))
        phase("termStats agg+ckpt")(
          postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
            .localCheckpoint(true))
        phase("tot agg (from cl)")(
          cl.agg(count(lit(1)).as("nd"),
            sum(col("dl")).as("tt")).localCheckpoint(true))
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
      case "rag_incr_detail" =>
        import org.apache.spark.sql.functions._
        val docs = graft.core.Graft.table(spark, sfDir, "documents")
        val path = graft.core.Graft.scratch("prof_rag_incr")
        val baseIdx = phase("base build (49/50)")(
          queries.TextQueries.ragIndexBuildOf(docs.filter(col("doc_id") % 50 =!= 49)))
        phase("save")(queries.TextQueries.ragIndexSave(baseIdx, path))
        val loaded = phase("load")(queries.TextQueries.ragIndexLoad(spark, path))
        val appended = phase("append 1/50")(
          queries.TextQueries.ragIndexAppend(loaded, docs.filter(col("doc_id") % 50 === 49)))
        val qt = queries.TextQueries.ragQueryTermsOf(docs, 23L).localCheckpoint(true)
        val qv = queries.TextQueries.ragQueryVectorOf(docs, 23L).localCheckpoint(true)
        val served = phase("serve plan")(
          queries.TextQueries.ragServeDisk(appended, qt, qv, 20))
        phase("serve exec")(drain(served))
      case "setsim_detail" =>
        import org.apache.spark.sql.functions._
        import graft.operators.Dedup
        val docs = graft.core.Graft.table(spark, sfDir, "documents")
          .select(col("doc_id").as("id"),
            array_distinct(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("toks"))
        val (sorted, pref, cand) = phase("setsim sorted build")(
          Dedup.setSimParts(docs, 80))
        phase("setsim pref count")(drain(pref.select(col("id"))))
        val c = phase("setsim cand distinct")(cand.localCheckpoint(true))
        System.err.println(s"[prof] cand rows ${c.count()}")
        phase("setsim verify join")(drain(
          c.join(sorted.select(col("id").as("a"), col("ws").as("wa"), col("n").as("na")), "a")
            .join(sorted.select(col("id").as("b"), col("ws").as("wb"), col("n").as("nb")), "b")
            .withColumn("inter", size(array_intersect(col("wa"), col("wb"))).cast("long"))
            .filter(lit(100) * col("inter") >= lit(80) * (col("na") + col("nb") - col("inter")))
            .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))))
        phase("setsim FULL q128")(drain(Dedup.setSimJoin(docs, 80)))
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
