package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric aggregation.
  *
  * Summing doubles is order-dependent (~1e-11 relative error at 1e5 rows),
  * so a raw `sum(double)` can hash-differently between Spark and an oracle
  * engine even when both are "correct". The fix: round each addend to a
  * decimal with fixed scale (exact — the source data carries <= `scale`
  * fractional digits), sum exactly in decimal, and render the exact result
  * back as a double. Both engines then produce bit-identical values
  * regardless of partitioning / summation order — which is also the property
  * you want on a 1000-executor cluster, where partial-aggregate order is
  * nondeterministic run to run.
  *
  * DuckDB oracle equivalent of `dsum(x)`:
  *   CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
  */
object OracleSafe {
  val Scale = 6

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast(s"decimal(28,$Scale)")).cast("double")

  /** Order-independent mean: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column =
    sum(c.cast(s"decimal(28,$Scale)")).cast("double") /
      count(c).cast("double")
}
