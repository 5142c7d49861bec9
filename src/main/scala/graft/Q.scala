package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the driver tables plus
  * (when SQL-expressible) a DuckDB oracle producing the identical result.
  *
  * Contract notes (see builder prompt):
  *  - column names must match between `run`'s output and `oracle`;
  *  - values must be *bit*-identical across engines, so queries stick to
  *    BIGINT / STRING / raw pass-through doubles; aggregated numerics are
  *    computed in exact DECIMAL, then `round(x, s)` + cast to DOUBLE at the
  *    very end (one correctly-rounded conversion in each engine — never an
  *    engine-ordered float accumulation, never a DECIMAL in the output);
  *  - row order is encoded as an explicit `rank` column when the operator's
  *    semantics are about ordering (the compare is set-based).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Shorthand for a fully oracle-checked query. */
  def checked(name: String, sql: String)(
      f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, Some(sql.stripMargin.trim))

  /** Rows-only query (no SQL-expressible oracle). */
  def rowsOnly(name: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, None)
}
