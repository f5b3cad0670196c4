package graft

import graft.functions.GraftExtensions

/** The SQL-function surface of the native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // idempotent
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }

  test("graft_dot null behaviour matches expression semantics") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0d)) AS d").collect()(0).isNullAt(0))
  }

  test("graft_shingles is callable from SQL; n must be a literal") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_shingles('a b c d', 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
    assert(spark.sql("SELECT graft_shingles(NULL, 3) AS s").collect()(0).isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', length('xx'))").collect()
    }
  }
}
