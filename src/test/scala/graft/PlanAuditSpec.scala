package graft

import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}

/** Plan-shape gate: no query may funnel its result through a single
  * partition (`repartition(1)` / `coalesce(1)`). Operators emit
  * unordered output — the oracle compare sorts rows — so any
  * single-partition exchange in a query plan is a scale bug, not a
  * correctness need (a 100 TB result would serialize through one task).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no query plan contains a single-partition repartition/coalesce") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val funnels = plan.collect {
          case r: Repartition if r.numPartitions == 1 => r.nodeName
          case r: RepartitionByExpression
              if r.optNumPartitions.contains(1) => r.nodeName
        }
        spark.sharedState.cacheManager.clearCache()
        if (funnels.nonEmpty) Some(s"$name: ${funnels.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"single-partition funnels in:\n${offenders.mkString("\n")}")
  }
}
