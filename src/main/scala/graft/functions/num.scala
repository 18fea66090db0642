package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic output casts.
  *
  * Discipline (learned the hard way in round 9): wide decimals are for
  * INTERNAL accumulation only — a `DECIMAL(38,0)` in a final SELECT
  * hashes apart from the DuckDB oracle's `HUGEINT`/`BIGINT` even when
  * every digit matches, because the driver's comparator is
  * type-sensitive. Every query's output contract therefore narrows to
  * BIGINT (when the value provably fits int64) or STRING digits (when
  * it genuinely can't), and the oracle's outer SELECT carries the same
  * cast.
  */
object num {

  /** Narrow an exact wide-decimal column to BIGINT, raising (not
    * null-wrapping) if a value falls outside Long range — the same
    * loud-overflow contract DuckDB's `HUGEINT → BIGINT` cast has, so a
    * scale-up that breaks the bound fails identically on both engines
    * instead of silently diverging. Stays inside codegen (`when` +
    * `raise_error`), no UDF.
    */
  def toLongChecked(c: Column, name: String): Column = {
    val lo = lit(Long.MinValue).cast("decimal(38,0)")
    val hi = lit(Long.MaxValue).cast("decimal(38,0)")
    when(c.isNull, lit(null).cast("long"))
      .when(c >= lo && c <= hi, c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$name exceeds BIGINT range: "), c.cast("string"))).cast("long"))
  }

  /** Exact floor division that STAYS wide: Spark's `div`
    * (IntegralDivide) always narrows its quotient to BIGINT, so a
    * quotient past int64 raises under ANSI even when the caller wants
    * to keep accumulating in decimal. For non-negative operands,
    * a − (a % b) is exactly divisible by b, so the decimal divide is
    * exact (no fractional part for the result-scale rounding to touch)
    * and the cast back to scale 0 loses nothing. Exact while the
    * quotient fits 32 digits (decimal(38,6)'s integral capacity) —
    * beyond the reach of any gate SF. Matches DuckDB `//` on HUGEINT.
    */
  def floorDivWide(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    ((ad - pmod(ad, bd)) / bd).cast("decimal(38,0)")
  }

  /** Emit an exact wide-decimal as its decimal-digit STRING — the
    * portable representation for values that genuinely exceed int64
    * (both Spark's DecimalType and DuckDB's HUGEINT print plain
    * digits, no exponent, `-` sign).
    */
  def digits(c: Column): Column = c.cast("string")
}
