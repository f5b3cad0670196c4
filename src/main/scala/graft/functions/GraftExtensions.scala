package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the native expressions
  * available as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works for SQL-only users. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `GraftExtensions.register(spark)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFunction)
}

object GraftExtensions {
  private val dotFunction = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Idempotent in-session registration (for sessions built without the
    * extensions config — e.g. the driver's own). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
