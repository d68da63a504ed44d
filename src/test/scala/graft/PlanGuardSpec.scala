package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale guardrails over every catalog query's PHYSICAL plan.
  *
  * Correctness is the oracle gate's job; these tests pin the plan
  * properties that decide whether the same pipeline survives a 100×
  * scale-up. They walk the executed plan (sf0.001 inputs — plan shape, not
  * data, is under test) and fail on the two classic silent scale killers:
  *
  *  - an unpartitioned window (WindowExec with empty partitionSpec moves
  *    EVERY row to one partition — works at test scale, single-task at
  *    100 TB; Spark only warns at runtime, and a warning in a log nobody
  *    reads is not a guardrail);
  *  - an unintended cartesian product (CartesianProductExec appears when a
  *    join degenerates to a cross product of two large sides; the catalog's
  *    deliberate cross joins are all broadcast of 1-row/tiny frames, which
  *    plan as BroadcastNestedLoopJoin, never CartesianProductExec).
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(walk) ++
      p.subqueries.flatMap(walk)
  }

  private def plans(name: String): Seq[SparkPlan] = {
    val df = graft.queries.Catalog.byName(name).fn(spark, sf)
    walk(df.queryExecution.executedPlan)
  }

  private val allNames = graft.queries.Catalog.everything.map(_.name)

  test("no catalog query plans an unpartitioned window") {
    val offenders = allNames.flatMap { name =>
      plans(name).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => s"$name: $w"
      }
    }
    assert(offenders.isEmpty, s"global-window plans:\n${offenders.mkString("\n")}")
  }

  test("no catalog query plans a cartesian product") {
    val offenders = allNames.flatMap { name =>
      plans(name).collect { case c: CartesianProductExec => s"$name" }
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }
}
