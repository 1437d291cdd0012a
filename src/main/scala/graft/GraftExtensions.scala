package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.QuantizedDot

/** Spark plug-in entry point: registers graft's native Catalyst
  * expressions at session build time via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions`). This is the deployment path for a real
  * cluster — spark-defaults.conf / `--conf` — so every session on every
  * executor resolves the functions without any driver-side registration
  * call. `GraftFunctions.register` stays as the programmatic fallback
  * for sessions that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "quantized_dot(a, b)")
        QuantizedDot(exprs(0), exprs(1))
      }))
  }
}
