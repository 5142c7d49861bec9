package graft.api

import graft.operators.{Aggregates, FieldSelection, KeyFieldSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Migration facade: the reference user's mental model —
  * input → mapper → combiner/reducer → sort/partition → output
  * (`JobConf.setMapperClass/setReducerClass/...`) — as a fluent builder
  * that compiles to one declarative DataFrame plan. Each stage maps to the
  * engine operator documented in COVERAGE.md; Catalyst fuses the chain
  * (ChainMapper semantics) and provides the combiner automatically.
  *
  * This is sugar, not a second engine: `build()` returns the DataFrame, so
  * jobs interoperate with every other operator in the library.
  */
final case class GraftJob(df: DataFrame) {

  /** IdentityMapper — no-op, for symmetry. */
  def identity: GraftJob = this

  /** TokenCountMapper: tokenize `line` into a `word` column. */
  def tokenize(line: Column, sep: String = "[ \\t\\n\\r\\f\\x0B]+"): GraftJob =
    GraftJob(df.select(explode(split(line, sep)).as("word"))
      .filter(length(col("word")) > 0))

  /** RegexMapper: emit one row per regex match of `line`. */
  def regexExtract(line: Column, pattern: String): GraftJob =
    GraftJob(df.select(
      explode(regexp_extract_all(line, lit(pattern), lit(0))).as("word")))

  /** FieldSelectionMapReduce: project (key, value) via the `cut`-style
    * spec over separator-split records.
    */
  def fieldSelect(line: Column, sep: String, spec: String): GraftJob = {
    val (k, v) = FieldSelection.project(line, sep, spec)
    GraftJob(df.select(k.as("key"), v.as("value")))
  }

  /** LongSumReducer / WordCount reduce: count per group column. */
  def countBy(key: Column): GraftJob =
    GraftJob(df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt")))

  /** Aggregate framework: descriptor strings per group key. */
  def aggregateBy(key: Column, descriptors: String*): GraftJob =
    GraftJob(Aggregates.aggregate(df, key, descriptors))

  /** KeyFieldBasedComparator: global sort of `line` by a `-k` spec. */
  def sortByKeyFields(line: Column, sep: String, spec: String): GraftJob =
    GraftJob(df.orderBy(KeyFieldSpec.sortColumns(line, sep, spec): _*))

  /** KeyFieldBasedPartitioner: route rows by the hashed key fields. */
  def partitionByKeyFields(line: Column, sep: String, spec: String, n: Int): GraftJob =
    GraftJob(df.repartition(n, KeyFieldSpec.partitionColumns(line, sep, spec): _*))

  /** Arbitrary chained map stage (ChainMapper). */
  def map(f: DataFrame => DataFrame): GraftJob = GraftJob(f(df))

  def build(): DataFrame = df
}

object GraftJob {
  def input(df: DataFrame): GraftJob = GraftJob(df)
}
