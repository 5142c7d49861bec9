package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Counters/metrics facade (SURVEY §2.10): the reference's job counters
  * (`src/mapred/org/apache/hadoop/mapred/Counters.java:52`; framework enum
  * `Task.java:73-95` — MAP_INPUT_RECORDS, MAP_OUTPUT_RECORDS, …) mapped to
  * Spark's `Dataset.observe` named metrics: zero-cost aggregates collected
  * by the existing task machinery, no extra pass and no accumulator races
  * (observe metrics are exactly-once per query, unlike raw accumulators
  * under task retries — strictly better at 1000-executor scale).
  */
object Counters {

  val ObservationName = "graft.counters"

  /** Attach reference-style counters to a frame: record count plus any
    * user-named aggregates. Read them back with [[lastObserved]] after an
    * action, or via a QueryExecutionListener in production.
    */
  def instrument(df: DataFrame, extra: (String, Column)*): DataFrame = {
    val metrics = count(lit(1)).as("RECORDS") +:
      extra.map { case (n, c) => c.as(n) }
    df.observe(ObservationName, metrics.head, metrics.tail: _*)
  }

  /** Counter values from the most recent action on an instrumented frame
    * (driver-side, one row of aggregates).
    */
  def lastObserved(df: DataFrame): Map[String, Any] =
    lastObservedNamed(df, ObservationName)

  /** Same, for a frame carrying a differently-named observation (operators
    * attach their own — e.g. `graft.lsh.bucket_cap` on [[Dedup.candidatePairs]]).
    */
  def lastObservedNamed(df: DataFrame, name: String): Map[String, Any] = {
    val row: Row = df.queryExecution.observedMetrics.getOrElse(
      name, sys.error(s"frame carries no observation named '$name'"))
    row.schema.fieldNames.zip(row.toSeq).toMap
  }
}
