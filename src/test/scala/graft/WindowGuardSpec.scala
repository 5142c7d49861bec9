package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.scalatest.funsuite.AnyFunSuite

/** Permanent scale-regression net: NO registered query may plan a
  * full-cardinality single-partition window. An unpartitioned WindowExec
  * is only acceptable when its input is already bounded by a
  * TakeOrderedAndProject or WindowGroupLimit below it — otherwise the
  * whole dataset funnels through one task at 100 TB (the round-1 q02
  * scale-killer, made structurally impossible to reintroduce).
  */
class WindowGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case other                    => other
  }

  private def bounded(p: SparkPlan): Boolean =
    p.collectFirst {
      case _: TakeOrderedAndProjectExec => ()
      case _: WindowGroupLimitExec      => ()
    }.isDefined

  test("no registered query has an unbounded single-partition window") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = unwrap(q.run(spark, TestSpark.sf0001).queryExecution.executedPlan)
      plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          s"${q.name}: ${w.simpleStringWithNodeId()}"
      }
    }
    assert(offenders.isEmpty, "unbounded global windows:\n" + offenders.mkString("\n"))
  }
}
