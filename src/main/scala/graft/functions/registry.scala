package graft.functions

import graft.functions.expressions.{BloomMightContain, DotProduct, ZOrderKey}
import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's native Catalyst expressions,
  * so `spark.sql(...)` users can call them directly.
  *
  * Only true `Expression` classes register here: Column-API compositions
  * (haversine, date codecs, …) are already reachable from SQL as the
  * built-ins they compose, and Spark 4's column-node representation does
  * not round-trip through FunctionRegistry builders.
  */
object registry {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order_key", exprs => ZOrderKey(exprs), "scala_udf")
  }
}
