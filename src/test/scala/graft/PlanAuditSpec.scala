package graft

/** Plan-shape regression guard: NO registered query may plan an
  * unconstrained CartesianProduct — the join shapes are broadcast-NLJ
  * (small side broadcast) or keyed joins by construction, and a silent
  * regression to a cartesian is exactly the class of change that survives
  * a correctness gate but dies at 100 TB.
  */
class PlanAuditSpec extends SparkSuite {

  test("no probe plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.probes.flatMap { p =>
      try {
        val plan = p.run(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(p.name) else None
      } catch {
        case _: Throwable => None // execution errors are the oracle's job
      }
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
