package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of graft's native Catalyst expressions as SQL temp
  * functions, so plans reference them via `expr("quantized_dot(a, b)")`
  * without private Column constructors. Idempotent per session.
  */
object GraftFunctions {
  // sessions already registered — re-registering is harmless but logs a
  // "replaced a previously registered function" WARN per call site,
  // drowning the bench tail (dozens of callers per run)
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) {
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
        .createOrReplaceTempFunction(
          "quantized_dot",
          { exprs: Seq[Expression] =>
            require(exprs.length == 2, "quantized_dot(a, b)")
            org.apache.spark.sql.graft.QuantizedDot(exprs(0), exprs(1))
          },
          "scala_udf")
    }
  }
}
