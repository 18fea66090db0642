package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector expressions over `array<float|double>` embedding columns.
  *
  * Built from `zip_with`/`aggregate` higher-order functions: codegen'd,
  * no UDF, no driver-side math. The left-fold accumulation order is
  * deterministic (sequential over the array), which keeps results
  * bit-reproducible across runs and engines.
  */
object vectors {

  /** array<float> → array<double> (promote before arithmetic so every
    * downstream op is double-precision).
    */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Native codegen'd dot product (graft.functions.expressions.DotProduct);
    * index-ascending accumulation, bit-identical to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(expressions.DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Higher-order-function composition kept as the reference semantics
    * (interpreted; used to cross-check the native expression in specs).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Fixed-point squared L2 distance: per-dim squared difference rounded
    * to the 1e-12 grid, then summed as longs. Each per-dim term is a
    * deterministic IEEE expression (same value in any engine evaluating
    * the same order), and the long sum is order-free — so distances
    * compare EXACTLY across engines, with no ulp-tiebreak risk in
    * argmin/top-k (the PQ codebook-assignment / ADC arithmetic).
    * Native codegen'd loop (graft.functions.expressions.L2SqFixed);
    * bit-identical to [[l2SqFixedHof]] (spec-pinned).
    */
  def l2SqFixed(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(expressions.L2SqFixed(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Higher-order-function composition kept as the reference semantics
    * (interpreted; cross-checks the native expression in specs).
    */
  def l2SqFixedHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => round((x - y) * (x - y) * lit(1000000000000.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
