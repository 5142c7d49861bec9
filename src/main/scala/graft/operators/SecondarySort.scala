package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}

/** The secondary-sort / sorted-group-iterator contract (SURVEY §2.5).
  *
  * Reference: `src/examples/org/apache/hadoop/examples/SecondarySort.java:57-224`
  * — partition by the primary key (`FirstPartitioner:133`), group by the
  * primary (`FirstGroupingComparator:145`), sort the composite key, so
  * `reduce(key, values)` sees each group's values in secondary-sort order.
  *
  * Spark shape: `repartition(primary)` routes every group to exactly one
  * partition (the Partitioner), `sortWithinPartitions(primary, secondary…)`
  * is the map-side sort + merge, and `mapPartitions` walking consecutive
  * equal-key runs is the grouping comparator + reducer loop. One shuffle,
  * no per-group buffering beyond the run the fold consumes — the same cost
  * profile as the reference, and safe at 100 TB because values stream
  * through the fold instead of being collected per group.
  */
object SecondarySort {

  /** Run `f` over each key group with rows iterated in secondary-sort
    * order. `groupKey` extracts the primary key from a row; rows arrive at
    * `f` exactly as sorted by `primary +: secondaries`.
    */
  def sortedGroups[R: Encoder](
      df: DataFrame,
      primary: Column,
      secondaries: Seq[Column])(
      groupKey: Row => Any)(
      f: (Any, Iterator[Row]) => R): Dataset[R] = {
    val sorted = df
      .repartition(primary)
      .sortWithinPartitions(primary +: secondaries: _*)
    sorted.mapPartitions { rows =>
      new Iterator[R] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): R = {
          val k = groupKey(it.head)
          // stream this group's run without materializing it
          val group = new Iterator[Row] {
            def hasNext: Boolean = it.hasNext && groupKey(it.head) == k
            def next(): Row = it.next()
          }
          val r = f(k, group)
          // drain any unconsumed remainder of the group
          while (group.hasNext) group.next()
          r
        }
      }
    }
  }
}
