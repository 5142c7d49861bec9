package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Training-sequence packing (builder brief: what a large-scale training
  * pipeline needs; no reference counterpart): GPT-style dataset prep
  * concatenates every document's tokens in a fixed corpus order and cuts
  * the stream into fixed-length sequences, so each document owns the
  * token span `[start_off, start_off + n_tokens)` and lands in sequences
  * `start_off / seqLen .. (start_off + n_tokens - 1) / seqLen`.
  *
  * The whole operator is one DISTRIBUTED prefix sum — the classic
  * two-pass shape, same family as `RDD.zipWithIndex`: range-partition by
  * the corpus order key and sort within partitions, compute one token
  * subtotal per partition, scan those few numbers on the driver (one Long
  * per partition — the SortValidate boundary-stats pattern, NOT a data
  * collect), then stream each partition once adding its offset. No
  * single-partition window, no global sort barrier beyond the range
  * exchange; at 100 TB the per-partition pass is the scan and the driver
  * sees kilobytes.
  */
object Packing {

  /** Per-doc token offsets in doc_id order: `(doc_id, n_tokens,
    * start_off)`. `parts` controls the range partitioning of the pass.
    */
  def tokenOffsets(docs: DataFrame, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Both passes MUST see identical partition contents; persisting the
    // shuffled+sorted frame makes that contract explicit (rather than
    // leaning on shuffle-output reuse) and skips re-running the
    // within-partition sort in the second job. The result rides on eager
    // localCheckpoint blocks so the intermediate can be freed here and
    // now — the Dedup persistence idiom; the session sweep (or
    // Dedup.release) frees the checkpoint blocks after consumption.
    val sorted = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var acc = offsets(i)
        it.map { case (id, n) => val s = acc; acc += n; (id, n, s) }
      }
      .toDF("doc_id", "n_tokens", "start_off")
      .localCheckpoint(true)
    sorted.unpersist(false)
    out
  }

  /** Budget-capped corpus selection — the data-selection primitive of
    * budget-constrained training (keep the best documents until B tokens
    * are filled): documents are taken in (`score` DESC, doc_id) order
    * while the RUNNING token total stays within `budget`. Returns
    * `(doc_id, n_tokens, cum_tokens)` for the selected documents.
    *
    * Same two-pass distributed prefix sum as [[tokenOffsets]] — range-
    * partition on the selection order, one subtotal per partition to the
    * driver, stream each partition once — never a single-partition
    * window. Partitions whose START offset already exceeds the budget
    * are skipped outright (their input is never iterated), so at 100 TB
    * a tight budget touches only the leading partitions of the
    * score-ordered corpus after the subtotal pass.
    */
  def selectUnderBudget(docs: DataFrame, score: Column, budget: Long,
                        parts: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs
      .select(score.cast("long").as("score"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("score").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._3).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        if (offsets(i) >= budget) Iterator.empty
        else {
          var acc = offsets(i)
          it.map { case (_, id, n) => acc += n; (id, n, acc) }
            .takeWhile(_._3 <= budget)
        }
      }
      .toDF("doc_id", "n_tokens", "cum_tokens")
      .localCheckpoint(true)
    sorted.unpersist(false)
    out
  }

  /** [[tokenOffsets]] generalized to an arbitrary LONG size column:
    * `(id, size, start_off)` where `start_off` is the exact sum of the
    * sizes of all rows before this one in `idCol` order — the same
    * two-pass distributed prefix sum, sizes supplied instead of counted
    * from text. The id order must be unique or the offsets are not
    * reproducible.
    */
  def sizeOffsets(df: DataFrame, idCol: String, sizeCol: String,
                  parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long"), col(sizeCol).cast("long"))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .as[(Long, Long)]
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var acc = offsets(i)
        it.map { case (id, n) => val s = acc; acc += n; (id, n, s) }
      }
      .toDF(idCol, sizeCol, "start_off")
      .localCheckpoint(true)
    sorted.unpersist(false)
    out
  }

  /** Global 0-based rank in `(orderCols…)` order, appended as a `rank`
    * column — `RDD.zipWithIndex` semantics but over an EXPLICIT total
    * order: the same two-pass distributed prefix sum as [[tokenOffsets]],
    * counting rows instead of tokens (range-partition by the order key,
    * sort within partitions, one row-count per partition to the driver,
    * stream offsets back). The order must be total (include a unique
    * tiebreak column) or the rank is not reproducible.
    */
  def globalRank(df: DataFrame, orderCols: Seq[String], parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keys = orderCols.map(col)
    val sorted = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      // accumulate in Long: Iterator.size returns Int and a range
      // partition past 2^31 rows would silently overflow the offsets
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.foldLeft(0L)((n, _) => n + 1))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = sorted.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ acc)
        acc += 1
        r
      }
    }
    val out = spark.createDataFrame(ranked,
        df.schema.add("rank", org.apache.spark.sql.types.LongType, nullable = false))
      .localCheckpoint(true)
    sorted.unpersist(false)
    out
  }

  /** EXCLUSIVE running maximum of LONG `valueCol` in `(orderCols…)`
    * order, appended as nullable `cummax_excl` (null on the global first
    * row) — the max-monoid sibling of [[runningTotal]], same two-pass
    * distributed prefix shape: one (partition → max) pair to the driver,
    * offsets streamed back. Exclusive (strictly-preceding rows only)
    * because the consumers are dominance tests — "does anything EARLIER
    * in the order beat me" (skyline/Pareto fronts, high-water-mark
    * audits). The order must be total (unique key); descending orders
    * pre-negate the sort key.
    */
  def runningMax(df: DataFrame, orderCols: Seq[String], valueCol: String,
                 parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keys = orderCols.map(col)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxes = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        var m = Long.MinValue; var any = false
        it.foreach { r =>
          val v = r.getLong(vIdx); if (!any || v > m) { m = v; any = true }
        }
        Iterator.single(i -> (if (any) Some(m) else None))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets: Array[Option[Long]] =
      maxes.scanLeft(Option.empty[Long]) {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (Some(a), None)    => Some(a)
        case (None, b)          => b
      }
    val out = sorted.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        val prev = acc
        val v = row.getLong(vIdx)
        acc = Some(acc.fold(v)(math.max(_, v)))
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq :+ prev.map(java.lang.Long.valueOf).orNull)
      }
    }
    val res = spark.createDataFrame(out,
        df.schema.add("cummax_excl", org.apache.spark.sql.types.LongType,
          nullable = true))
      .localCheckpoint(true)
    sorted.unpersist(false)
    res
  }

  /** INCLUSIVE running total of LONG `valueCol` in `(orderCols…)` order,
    * appended as `cum` — the value-weighted sibling of [[globalRank]]
    * (same two-pass distributed prefix sum; the driver sees one partial
    * sum per partition, never data). The order must be total (include a
    * unique tiebreak column); descending orders are expressed by
    * pre-negating the sort key. Accumulates in Long — callers own the
    * no-overflow bound on Σ|value| (document it at the call site).
    */
  def runningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
                   parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keys = orderCols.map(col)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.foldLeft(0L)((n, r) => n + r.getLong(vIdx)))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val cum = sorted.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        acc += row.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ acc)
      }
    }
    val out = spark.createDataFrame(cum,
        df.schema.add("cum", org.apache.spark.sql.types.LongType, nullable = false))
      .localCheckpoint(true)
    sorted.unpersist(false)
    out
  }

  /** [[tokenOffsets]] plus the sequence assignment at `seqLen` tokens:
    * first/last sequence index per doc and whether the doc straddles a
    * sequence boundary (the span a loader must reassemble).
    */
  def packed(docs: DataFrame, seqLen: Int, parts: Int = 32): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val first = expr(s"start_off DIV $seqLen")
    val last = expr(s"(start_off + n_tokens - 1) DIV $seqLen")
    tokenOffsets(docs, parts)
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        first.as("first_seq"), last.as("last_seq"),
        (first =!= last).as("crosses_boundary"))
  }
}
