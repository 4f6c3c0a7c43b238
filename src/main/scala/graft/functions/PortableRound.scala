package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine-stable rounding.
  *
  * Spark's `round` rounds the DECIMAL rendering of a double (BigDecimal
  * HALF_UP); DuckDB rounds the BINARY value. At exact half points
  * (common: averages of 2-decimal money values) the two disagree by one
  * ulp-turned-1e-4 — a hash-compare landmine. `floor(x·10⁴ + 0.5)/10⁴`
  * is pure IEEE arithmetic, so both engines produce bit-identical
  * results from identical inputs. Import AFTER `functions._` to shadow
  * the built-in `round`.
  */
object PortableRound {
  def round(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale.toDouble)
    floor(c * f + 0.5) / f
  }
}
