package graft

/** Whole-surface plan health: every SparkEntry query is planned and
  * scanned for the one unambiguous 100 TB red flag — a SHUFFLED
  * cartesian product (`CartesianProductExec`). One-row broadcast totals
  * legitimately plan as `BroadcastNestedLoopJoin` (q93/q98/q101 style)
  * and are allowed; a CartesianProduct means a non-broadcast side
  * crossed a non-trivial side and would melt at scale.
  *
  * This is the sweep companion to SurfacePlanSpec's targeted pins: new
  * queries get this check for free the moment they register.
  */
class PlanHealthSpec extends SparkSpec {

  test("no registered query plans a shuffled cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"shuffled cartesian in: ${offenders.mkString(", ")}")
  }

  test("every registered query has oracle SQL or is explicitly exempt") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL — keep that set EMPTY so every claimed operator stays
    // inside the hash-compare gate
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
