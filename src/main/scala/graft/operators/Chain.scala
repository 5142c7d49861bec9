package graft.operators

import org.apache.spark.sql.DataFrame

/** ChainMapper/ChainReducer (SURVEY §2.10): the reference composes
  * `[MAP+ / REDUCE MAP*]` stages inside one task to avoid extra I/O
  * (`src/mapred/org/apache/hadoop/mapred/lib/ChainMapper.java:30-47`).
  * In Spark the same thing is function composition over DataFrames —
  * whole-stage codegen fuses the chained transforms into one generated
  * loop, so the "no intermediate I/O" property is automatic.
  */
object Chain {

  /** Compose transforms left-to-right: `chain(f, g, h)(df) = h(g(f(df)))`. */
  def chain(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    stages.reduceLeft(_ andThen _)
}
