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
}
