package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF surface (SURVEY §2.10): the reference's
  * `Reducer.reduce(key, values)` fold contract as a Catalyst-managed typed
  * aggregate with partial aggregation (the Combiner) handled by Spark.
  *
  * `CappedUniq` mirrors `UniqValueCount`
  * (`src/mapred/org/apache/hadoop/mapred/lib/aggregate/UniqValueCount.java:81-86`)
  * with the engine's documented deterministic cap: keep the `cap` smallest
  * distinct values (sorted order), so the buffer is bounded at `cap`
  * elements regardless of group cardinality — safe to run over 100 TB where
  * an unbounded distinct-set buffer would OOM. The reported count is
  * min(distinct, cap), identical to the capped-set size.
  */
object TypedAggs {

  final case class CappedUniqResult(cnt: Long, items: String)

  /** Aggregator[value, sorted-distinct-capped buffer, (count, joined items)]. */
  final class CappedUniq(cap: Int)
      extends Aggregator[String, List[String], CappedUniqResult] {

    override def zero: List[String] = Nil

    // buffer invariant: sorted, distinct, size <= cap
    override def reduce(b: List[String], v: String): List[String] =
      if (b.contains(v)) b
      else (v :: b).sorted.take(cap)

    override def merge(a: List[String], b: List[String]): List[String] =
      (a ++ b).distinct.sorted.take(cap)

    override def finish(b: List[String]): CappedUniqResult =
      CappedUniqResult(b.size.toLong, b.mkString(","))

    override def bufferEncoder: Encoder[List[String]] =
      ExpressionEncoder[List[String]]()

    override def outputEncoder: Encoder[CappedUniqResult] =
      Encoders.product[CappedUniqResult]
  }
}
