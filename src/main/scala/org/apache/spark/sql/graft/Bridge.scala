package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge. ExpressionUtils is private[sql], so the
  * conversion lives in the sql package namespace — the standard idiom for
  * Spark-native extension libraries shipping custom expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session's cache manager holds no cached plans — lets
    * tests assert that scoped caches (Dedup.withScopedCache) are released
    * without reaching into private[sql] state themselves. */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Block until the shared listener bus has delivered every queued event
    * (QueryExecutionListener callbacks ride this bus). Two callers need the
    * barrier: Dedup.withScopedCache, so a just-finished materialization
    * action's end-event cannot be delivered to a release listener
    * registered after it; and graft.Bench, so one query's async cache
    * release cannot land in the middle of the next query's timed run.
    * `listenerBus` is private[spark], hence this lives under the
    * org.apache.spark namespace with the rest of the bridge. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession,
                       timeoutMillis: Long = 30000): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () } // best-effort barrier
}
