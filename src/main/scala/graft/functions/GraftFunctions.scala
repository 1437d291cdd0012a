package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of graft's native Catalyst expressions as SQL temp
  * functions, so plans reference them via `expr("quantized_dot(a, b)")`
  * without private Column constructors. Idempotent per session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
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
