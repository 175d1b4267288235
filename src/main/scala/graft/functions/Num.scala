package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers for oracle-stable aggregation.
  *
  * Double summation is order-dependent; a distributed sum and a single-node
  * oracle disagree in the last ulps. We cast the addend to decimal first —
  * decimal addition is exact and associative, so any aggregation order gives
  * identical digits — and convert back to double only at the very end.
  */
object Num {
  /** Exact (order-independent) sum: cast each addend to DECIMAL(28,6). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6)))

  /** Finalize an exact decimal aggregate to a stable double output. */
  def fin(c: Column, scale: Int = 2): Column = round(c, scale).cast(DoubleType)
}
