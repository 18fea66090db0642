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
}
