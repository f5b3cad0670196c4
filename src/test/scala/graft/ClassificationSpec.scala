package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import graft.ops.Hrfco

/** Ports of the reference classification/validator tests
  * (WaterLevelValidatorTest.java:105-192) and the anomaly decision table
  * (AnomalyDetector.java:46-105), using the canonical threshold quadruple
  * (attwl=3, wrnwl=5, almwl=7, srswl=9) from the reference fixtures. */
class ClassificationSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq(
    // wlobscd, attwl, wrnwl, almwl, srswl
    ("S1", Some(3.0), Some(5.0), Some(7.0), Some(9.0)),   // full
    ("S2", None, None, None, Some(9.0)),                  // partial: 1 valid
    ("S3", Option.empty[Double], Option.empty[Double], Option.empty[Double], Option.empty[Double]) // all null
  ).toDF("wlobscd", "attwl", "wrnwl", "almwl", "srswl")

  /** Run one record through the full decision table. */
  private def classify(station: String, wl: Option[Double], fw: Option[Double] = Some(10.0)): Row = {
    val parsed = Seq((station, wl, fw)).toDF("wlobscd", "water_level", "flow_rate")
    Hrfco.classify(parsed, dim)
      .withColumn("alert_level", Hrfco.alertLevel)
      .select("range_valid", "is_anomaly", "flood_warning_level", "alert_level")
      .collect()(0)
  }

  private def level(r: Row): String = if (r.isNullAt(2)) null else r.getString(2)

  // -- T10 cascade with full thresholds (boundary `>=` is the spec) --------
  test("wl above critical → CRITICAL")        { assert(level(classify("S1", Some(10.0))) === "CRITICAL") }
  test("wl exactly critical → CRITICAL (>=)") { assert(level(classify("S1", Some(9.0))) === "CRITICAL") }
  test("wl in warning band → WARNING")        { assert(level(classify("S1", Some(8.0))) === "WARNING") }
  test("wl exactly warning → WARNING (>=)")   { assert(level(classify("S1", Some(7.0))) === "WARNING") }
  test("wl in caution band → CAUTION")        { assert(level(classify("S1", Some(6.0))) === "CAUTION") }
  test("wl in attention band → ATTENTION")    { assert(level(classify("S1", Some(4.0))) === "ATTENTION") }
  test("wl exactly attention → ATTENTION")    { assert(level(classify("S1", Some(3.0))) === "ATTENTION") }
  test("wl below all thresholds → NORMAL")    { assert(level(classify("S1", Some(2.0))) === "NORMAL") }

  // -- T7 physical range (defaults wl ∈ [-10, 50], null passes) ------------
  test("boundary -10.0 passes range")  { assert(classify("S1", Some(-10.0)).getBoolean(0)) }
  test("boundary 50.0 passes range")   { assert(classify("S1", Some(50.0)).getBoolean(0)) }
  test("below -10 fails range → anomaly, null stored level, ANOMALY alert") {
    val r = classify("S1", Some(-10.5))
    assert(!r.getBoolean(0) && r.getBoolean(1) && r.isNullAt(2) && r.getString(3) === "ANOMALY")
  }
  test("above 50 fails range → anomaly") { assert(classify("S1", Some(50.5)).getBoolean(1)) }
  test("out-of-range flow rate alone → anomaly") {
    val r = classify("S1", Some(5.0), Some(60000.0))
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }
  test("null measurements pass range") { assert(classify("S1", None, None).getBoolean(0)) }

  // -- T11 decision table ---------------------------------------------------
  test("dim row absent → NO_THRESHOLD stored, NORMAL alert") {
    val r = classify("UNKNOWN", Some(5.0))
    assert(!r.getBoolean(1) && level(r) === "NO_THRESHOLD" && r.getString(3) === "NORMAL")
  }
  test("all-null thresholds → NO_THRESHOLD stored, NORMAL alert") {
    val r = classify("S3", Some(5.0))
    assert(level(r) === "NO_THRESHOLD" && r.getString(3) === "NORMAL")
  }
  test("single valid threshold → PARTIAL_THRESHOLD stored, NORMAL alert") {
    val r = classify("S2", Some(5.0))
    assert(level(r) === "PARTIAL_THRESHOLD" && r.getString(3) === "NORMAL")
  }
  test("single valid threshold but wl reaches it → PARTIAL_THRESHOLD still stored") {
    // validCount==1 branch wins over the cascade in the reference ordering
    assert(level(classify("S2", Some(9.5))) === "PARTIAL_THRESHOLD")
  }
  test("null wl with full thresholds → NORMAL (cascade null coalesced)") {
    val r = classify("S1", None)
    assert(level(r) === "NORMAL" && !r.getBoolean(1))
  }

  // -- T12 store-vs-alert divergence ---------------------------------------
  test("alert level normalizes internal levels to NORMAL but store keeps them") {
    val r = classify("S3", Some(5.0))
    assert(level(r) === "NO_THRESHOLD" && r.getString(3) === "NORMAL")
    val r2 = classify("S1", Some(10.0))
    assert(level(r2) === "CRITICAL" && r2.getString(3) === "CRITICAL")
  }

  // -- T6 required-fields filter + T3 DLQ asymmetry ------------------------
  private def validCount(df: DataFrame): Long = df.filter(Hrfco.requiredFields).count()

  test("record missing station code is silently dropped") {
    val df = Seq(("", "202512091530", "1.0", "2.0"), ("S1", "202512091530", "1.0", "2.0"))
      .toDF("wlobscd", "ymdhm", "wl", "fw")
    assert(validCount(df) === 1)
  }
  test("record missing both measurements is silently dropped") {
    val df = Seq(("S1", "202512091530", " ", ""))
      .toDF("wlobscd", "ymdhm", "wl", "fw")
    assert(validCount(df) === 0)
  }
  test("record with only flow rate is kept") {
    val df = Seq(("S1", "202512091530", "", "2.0"))
      .toDF("wlobscd", "ymdhm", "wl", "fw")
    assert(validCount(df) === 1)
  }
  test("garbage-but-present measurement passes required-fields (raw-string check)") {
    // WaterLevelValidator.java:71-76 checks getWaterLevel() (the raw
    // string), so "abc" counts as present even though it parses to null
    val df = Seq(("S1", "202512091530", "abc", " "))
      .toDF("wlobscd", "ymdhm", "wl", "fw")
    assert(validCount(df) === 1)
  }
  test("malformed payload goes to the DLQ envelope (not silently dropped)") {
    val raw = Seq((1L, "S1", "{bad json"), (2L, "S1", """{"k": 7}"""))
      .toDF("event_id", "wlobscd", "raw_payload")
    val dlq = Hrfco.dlqEnvelope(raw).collect()
    assert(dlq.length === 1 && dlq(0).getAs[String]("originalValue") === "{bad json")
    assert(dlq(0).getAs[String]("errorReason").startsWith("Processing failed"))
  }

  // -- T13 Korean alert message --------------------------------------------
  test("alert message formats the Korean template with 2-decimal level") {
    val df = Seq(("1001602", Some(1.234), false, "NORMAL"))
      .toDF("wlobscd", "water_level", "is_anomaly", "flood_warning_level")
      .withColumn("alert_level", Hrfco.alertLevel)
      .withColumn("message", Hrfco.alertMessage)
    assert(df.collect()(0).getAs[String]("message") ===
      "관측소 1001602에서 NORMAL 수위 경보 (수위: 1.23 m)")
  }
  test("anomaly message uses the anomaly template") {
    val df = Seq(("1001602", Some(99.0), true, null: String))
      .toDF("wlobscd", "water_level", "is_anomaly", "flood_warning_level")
      .withColumn("message", Hrfco.alertMessage)
    assert(df.collect()(0).getAs[String]("message").contains("이상치 감지"))
  }
  test("fw-only anomaly (null wl) gets the missing-measurement anomaly variant") {
    val df = Seq(("1001602", Option.empty[Double], true, null: String))
      .toDF("wlobscd", "water_level", "is_anomaly", "flood_warning_level")
      .withColumn("message", Hrfco.alertMessage)
    assert(df.collect()(0).getAs[String]("message") === "관측소 1001602에서 이상치 감지 (수위 미계측)")
  }
}
