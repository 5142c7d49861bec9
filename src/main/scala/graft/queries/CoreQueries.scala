package graft.queries

import graft.Q
import graft.core.Graft.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** The first end-to-end slice (SURVEY §7.2) plus the core scan/agg/sort
  * surface: Grep, WordCount, TPC-H-Q1-flavor aggregation, pushed-down
  * scan, top-k. Each mirrors a reference program from SURVEY §2.11.
  *
  * Scale notes: every query here is a pure declarative plan — filters and
  * projections reach the parquet scan, aggregations get map-side partial
  * combine (the reference's Combiner, free in Catalyst), and the only
  * global-ordering steps are rank-encoding windows over already-aggregated
  * (small) data or `TakeOrderedAndProject` top-k, both safe at 100 TB input.
  */
object CoreQueries {

  /** Money/quantity arithmetic is done in DECIMAL so sums are exact and
    * order-independent — a float sum would differ between Spark's and the
    * oracle's accumulation order.
    */
  private val D = DecimalType(18, 4)

  /** TPC-H Q1 flavor: the `aggregate` framework's sum/count per group
    * (ValueAggregatorJob, `src/mapred/.../lib/aggregate/`), with the
    * combiner = Catalyst partial aggregation.
    */
  val q01Agg = Q.checked(
    "q01_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast(D)), 2).cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast(D)), 2).cast("double").as("sum_base_price"),
        round(sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D))), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** Grep (`src/examples/org/apache/hadoop/examples/Grep.java:48-84`):
    * regex-extract → count → global sort desc by count. The output order is
    * the point of the second job, so it's encoded as a `rank` column with a
    * deterministic tiebreak on the word, bounded to the top 100 so the
    * ranking never funnels the full distinct-word set through one task:
    * `row_number <= k` plans as WindowGroupLimit (per-partition top-k prune
    * before the final window), scale-safe at 100 TB.
    */
  val q02Grep = Q.checked(
    "q02_grep",
    """WITH words AS (
      |  SELECT unnest(regexp_extract_all(text, 's[a-z]+')) AS word FROM documents
      |), counts AS (
      |  SELECT word, count(*) AS cnt FROM words GROUP BY word
      |)
      |SELECT word, cnt, rank FROM (
      |  SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank
      |  FROM counts
      |) WHERE rank <= 100""") { (s, dir) =>
    table(s, dir, "documents")
      .select(explode(regexp_extract_all(col("text"), lit("s[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("word"))))
      .filter(col("rank") <= 100) // direct rank filter → InferWindowGroupLimit
      .withColumn("rank", col("rank").cast("long"))
  }

  /** WordCount (`src/examples/org/apache/hadoop/examples/WordCount.java`):
    * tokenize → explode → groupBy → count, combiner on (partial agg).
    */
  val q03WordCount = Q.checked(
    "q03_wordcount",
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(text, '[ \t\n\r\f\x0B]+')) AS word FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word""") { (s, dir) =>
    table(s, dir, "documents")
      .select(explode(split(col("text"), "[ \t\n\r\f\\x0B]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
  }

  /** Scan with projection + predicate — both must reach the parquet reader
    * (PushedFilters / pruned ReadSchema), the Catalyst win the reference's
    * hand-written map() never had. Doubles pass through untouched, so they
    * compare exactly.
    */
  val q04ScanProject = Q.checked(
    "q04_scan_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 30 AND l_returnflag = 'R'""") { (s, dir) =>
    table(s, dir, "lineitem")
      .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }

  /** Top-k: the reference's single-reducer "sort desc, take head" pattern
    * (`Grep.java:79`, gridmix "reference select"). One pass: the
    * `row_number <= k` filter plans as WindowGroupLimit, so each partition
    * is pruned to its top 10 before the final bounded window — no global
    * shuffle of the full data.
    */
  val q05TopK = Q.checked(
    "q05_topk",
    """SELECT o_orderkey, o_totalprice,
      |       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |FROM orders
      |QUALIFY rank <= 10""") { (s, dir) =>
    table(s, dir, "orders")
      .withColumn("rank",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") <= 10) // direct rank filter → InferWindowGroupLimit
      .select(col("o_orderkey"), col("o_totalprice"), col("rank").cast("long").as("rank"))
  }

  /** InverseMapper (`src/mapred/.../lib/InverseMapper.java`): (k,v)→(v,k). */
  val q06Inverse = Q.checked(
    "q06_inverse",
    "SELECT n_name AS key, n_nationkey AS value FROM nation") { (s, dir) =>
    table(s, dir, "nation")
      .select(col("n_name").as("key"), col("n_nationkey").cast("int").as("value"))
  }

  val all: Vector[Q] =
    Vector(q01Agg, q02Grep, q03WordCount, q04ScanProject, q05TopK, q06Inverse)
}
