package graft

import org.apache.spark.sql.functions._
import graft.ops.Hrfco

/** Ports of the reference model-coercion tests
  * (WaterLevelDataTest.java:47-90, StationThresholdTest.java:33-105):
  * blank/" "/garbage → null, valid parse, 12-digit time reformat with
  * non-12-digit passthrough, KST→UTC interpretation. */
class HrfcoCoercionSpec extends SparkSpec {
  import spark.implicits._

  private def coerce(s: String): Option[Double] = {
    val r = Seq(Option(s)).toDF("v")
      .select(Hrfco.guardedDouble(col("v")).as("d"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("null string coerces to null")        { assert(coerce(null).isEmpty) }
  test("empty string coerces to null")       { assert(coerce("").isEmpty) }
  test("single-space coerces to null")       { assert(coerce(" ").isEmpty) }
  test("whitespace-only coerces to null")    { assert(coerce("   ").isEmpty) }
  test("garbage coerces to null")            { assert(coerce("abc").isEmpty) }
  test("mixed garbage coerces to null")      { assert(coerce("not_a_number").isEmpty) }
  test("valid double parses")                { assert(coerce("1.23").contains(1.23)) }
  test("padded double parses trimmed")       { assert(coerce(" 1.23 ").contains(1.23)) }
  test("integer string parses as double")    { assert(coerce("45").contains(45.0)) }
  test("negative double parses")             { assert(coerce("-9.5").contains(-9.5)) }

  private def fmtTime(s: String): String =
    Seq(s).toDF("ymdhm")
      .select(Hrfco.formattedObservationTime(col("ymdhm")).as("t"))
      .collect()(0).getString(0)

  test("12-digit time reformats") {
    assert(fmtTime("202512091530") === "2025-12-09 15:30")
  }
  test("non-12-digit time passes through unchanged") {
    assert(fmtTime("2025-12-09") === "2025-12-09")
    assert(fmtTime("20251209153000") === "20251209153000")
  }

  test("12-char reformat is substring reassembly, not a parse (reference behavior)") {
    assert(fmtTime("abcdefghijkl") === "abcd-ef-gh ij:kl")
  }

  test("observation time is interpreted as KST and shifted to UTC") {
    val utc = Seq("202512091530").toDF("ymdhm")
      .select(date_format(
        Hrfco.observationTsUtc(col("ymdhm"), to_timestamp(lit("1970-01-01"))),
        "yyyy-MM-dd HH:mm").as("t"))
      .collect()(0).getString(0)
    assert(utc === "2025-12-09 06:30") // KST 15:30 = UTC 06:30
  }

  test("unparseable time falls back to the injected timestamp") {
    val utc = Seq("garbage-time").toDF("ymdhm")
      .select(date_format(
        Hrfco.observationTsUtc(col("ymdhm"), to_timestamp(lit("1999-09-09 09:09:09"))),
        "yyyy-MM-dd HH:mm").as("t"))
      .collect()(0).getString(0)
    assert(utc === "1999-09-09 09:09")
  }
}
