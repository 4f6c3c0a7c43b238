package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, sum}

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

  /** EXACT money-mass aggregation (the q200 discipline, promoted from
    * per-query comments to the one place it can't be forgotten): money
    * columns are 2-decimal values stored as double; summing them AS
    * double makes the total depend on summation ORDER once |total|·n·ε
    * nears the display grain (measured at sf1: 3e10-magnitude sums over
    * 6M rows drift past 4dp — and worse, a raw total fed into ranking
    * flipped a quantile boundary, q153). Cast once to decimal, sum
    * exactly, display as double at the end. Every registered query that
    * sums `o_totalprice` / `l_extendedprice` / `p_retailprice` must go
    * through these helpers — PlanSpec greps the operator sources and
    * fails on a raw-double money sum. */
  def money(c: Column): Column = c.cast("decimal(18,2)")

  /** 2-decimal rate/fraction (discount, tax) as exact decimal. */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** `lit(1)` as a 2-decimal rate, for `1 - discount`-style factors. */
  def oneRate: Column = lit(1).cast("decimal(4,2)")

  /** cast → exact decimal sum → double display. */
  def moneySum(c: Column): Column = sum(money(c)).cast("double")
}
