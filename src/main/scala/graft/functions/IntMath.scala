package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer column arithmetic shared by the bucketing operators. */
object IntMath {

  /** Floor division of any long expression by a positive long divisor.
    * Plain `/` on longs is IEEE double division — exactness is lost past
    * 2^53 (ns-scale epochs, cumulative token offsets), and `div` truncates
    * toward zero, which is wrong for negative values. Subtracting the
    * non-negative `pmod` first makes the numerator an exact multiple, and
    * the decimal(38,0) division preserves every bit.
    */
  def floorDiv(c: Column, divisor: Long): Column = {
    require(divisor > 0, "floorDiv divisor must be positive")
    val l = c.cast("long")
    ((l - pmod(l, lit(divisor))).cast("decimal(38,0)") / lit(divisor)).cast("long")
  }

  /** Column-divisor form (positive divisor expression): subtracting the
    * non-negative remainder first makes the numerator an exact multiple,
    * so the decimal quotient is exact and any engine's integer division
    * (floor OR truncate) agrees on it.
    */
  def floorDiv(c: Column, divisor: Column): Column = {
    val l = c.cast("long"); val d = divisor.cast("long")
    ((l - pmod(l, d)).cast("decimal(38,0)") / d.cast("decimal(38,0)"))
      .cast("long")
  }
}
