package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Session factory + table loader for the graft engine.
  *
  * The reference (kambatla/hadoop-1) configures each job via a `JobConf`
  * (`src/mapred/org/apache/hadoop/mapred/JobConf.java`); here the analogous
  * knobs live on one tuned `SparkSession`. All settings are chosen for the
  * 100 TB posture: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), explicit shuffle parallelism, and broadcast joins enabled so
  * small dimension tables never shuffle.
  */
object Graft {

  /** Create (or reuse) a tuned local session. `cores` defaults to the env the
    * driver passes; on a real cluster the same conf minus `master` applies.
    */
  def session(appName: String = "graft",
              cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // tolerate a TIMESTAMP(NANOS) events fixture (one driver generation
      // shipped that): read it as epoch-nanos LongType instead of erroring.
      // [[tsUs]] normalizes whichever shape arrives.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the graft tuning to a session someone else built (e.g. the
    * driver-created one in Verify/Bench). Runtime-mutable confs only.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Scratch directory for query round-trip fixtures — ONE definition of
    * the path scheme so isolation or cleanup changes land in one place.
    * Paths are namespaced per JVM (pid): a Verify and a Bench running
    * concurrently must never write the same round-trip fixture dir.
    * Within one JVM the per-name dir is stable, so repeated invocations
    * of a query reuse (overwrite) their own fixture. The run root is
    * wiped on first use (a recycled pid must not inherit a crashed run's
    * leftovers) and deleted again by a shutdown hook, so runs don't
    * accumulate fixture trees in the tmpdir.
    */
  private lazy val runRoot: java.nio.file.Path = {
    import scala.jdk.CollectionConverters._
    import scala.util.Try
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    // sweep dirs whose owning JVM died without its hook (kill -9, OOM):
    // only dead pids — a live concurrent run's fixtures are untouchable.
    // Best-effort hygiene: two runs may race on the same dead dir, or a
    // foreign/undeletable dir may match — neither may fail THIS run, so
    // every step is exception-tolerant.
    Try {
      val ls = java.nio.file.Files.list(tmp)
      try {
        ls.iterator().asScala
          .filter(_.getFileName.toString.matches("graft-run[0-9]+"))
          .filter { d =>
            d.getFileName.toString.stripPrefix("graft-run").toLongOption
              .exists(pid => ProcessHandle.of(pid).isEmpty)
          }
          .foreach(d => Try(deleteTree(d)))
      } finally ls.close()
    }
    val p = tmp.resolve(s"graft-run${ProcessHandle.current().pid()}")
    deleteTree(p)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => scala.util.Try(deleteTree(p))))
    p
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(f => scala.util.Try(java.nio.file.Files.deleteIfExists(f)))
      finally walk.close()
    }

  def scratch(name: String): String = s"$runRoot/$name"

  /** Epoch-MICROSECONDS view of an event-time column, as a LongType
    * expression — THE one place that absorbs fixture schema drift. The
    * driver's `events.ts` has shipped as epoch-nanos long, TIMESTAMP(NANOS)
    * (surfacing as long via `nanosAsLong`), and TIMESTAMP(MICROS) (NTZ,
    * pyarrow writes no zone); every engine query speaks epoch micros
    * internally (integral arithmetic, exact cross-engine compare vs
    * DuckDB's `epoch_us(ts)`), so normalize HERE, by the frame's resolved
    * dtype, never at call sites. NTZ casts through TimestampType first
    * (`unix_micros` wants an instant); sessions run UTC, so the NTZ wall
    * clock IS the instant and the cast is numerically free. Long input is
    * nanos by fixture contract: integral `div` keeps micros exact where a
    * double division would round at 1.7e18.
    */
  def tsUs(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case TimestampType    => unix_micros(col(name))
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case LongType         =>
        // A plain-long ts is epoch-nanos BY FIXTURE CONTRACT; if a driver
        // generation ever ships epoch-micros as a long instead, dividing
        // by 1000 would be silently 1000x off. Modern event times are
        // ≥ ~1.5e18 nanos while the same instants in micros sit near
        // 1.7e15, so a per-row floor (1e17 ≈ 1973 in nanos) turns that
        // drift into a loud failure instead. One codegen'd comparison per
        // row — free next to the scan.
        import org.apache.spark.sql.functions.{when, raise_error, concat, lit}
        val nanosFloor = 100000000000000000L
        when(col(name).isNull || col(name) >= nanosFloor,
          org.apache.spark.sql.functions.expr(s"`$name` div 1000"))
          .otherwise(raise_error(concat(
            lit(s"tsUs: `$name` value "), col(name).cast("string"),
            lit(" is below the plausible epoch-nanos range — " +
              "epoch-micros-as-long fixture drift?"))).cast(LongType))
      case dt => throw new IllegalArgumentException(
        s"tsUs: column `$name` has unsupported event-time type $dt " +
          "(expected TIMESTAMP, TIMESTAMP_NTZ, or epoch-nanos LONG)")
    }

  /** Load one of the driver tables (TESTDATA.md): `$dir/$name.parquet`.
    *
    * The inferred SCHEMA is cached per path — not the DataFrame: a cached
    * Dataset strongly references its session, which would pin stopped
    * sessions forever (and defeats weak keys — WeakHashMap's contract
    * forbids values that refer to their keys). A schema is session-free,
    * and supplying it to the reader skips the footer-inference tax that
    * repeated scans paid. Driver tables are immutable fixtures, so a
    * path's schema never drifts.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(
      path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }
}
