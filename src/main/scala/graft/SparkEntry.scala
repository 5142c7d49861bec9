package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers one `Q` in a module
  * under `graft.queries`; this object is just the flattened registry the
  * driver consumes.
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  def registry: Vector[Q] =
    CoreQueries.all ++ JoinQueries.all ++ AggQueries.all ++ SortQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      SourceQueries.all ++ MiscQueries.all ++ StoreQueries.all ++
      StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
