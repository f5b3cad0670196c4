package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.HttpPollSource
import graft.ops.Monitoring

/** Classified-row shape feeding Sinks.alertFrame (Option encodes the
  * nullable measurements). */
case class AlertInput(wlobscd: String, obs_time_fmt: String,
                      water_level: Option[Double], flow_rate: Option[Double],
                      alert_level: String, is_anomaly: Boolean, message: String)

/** Failed-record shape feeding Sinks.dlqFrame. */
case class DlqInput(wlobscd: String, raw_payload: String)

/** S2/S3 poll-source shape with an injected fake transport, the K5/K6/K7
  * kafka frame contract driven through a real streaming sink, plus the
  * humanized-bytes scalar surface. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val obsSchema = StructType(Seq(
    StructField("wlobscd", StringType), StructField("ymdhm", StringType),
    StructField("wl", StringType), StructField("fw", StringType)))

  test("pollObservations splits the content envelope into typed records") {
    val body =
      """{"content": [
        |  {"wlobscd": "1001602", "ymdhm": "202512091530", "wl": "1.23", "fw": "45.67"},
        |  {"wlobscd": "1001603", "ymdhm": "202512091530", "wl": " ", "fw": ""}
        |]}""".stripMargin
    val df = HttpPollSource.pollObservations(spark, () => body, obsSchema)
    assert(df.count() === 2)
    assert(df.columns.toSeq === Seq("wlobscd", "ymdhm", "wl", "fw"))
    assert(df.filter(col("wlobscd") === "1001602").collect()(0).getAs[String]("wl") === "1.23")
  }

  test("refreshStationDim upserts over the previous snapshot") {
    val stationSchema = StructType(Seq(
      StructField("wlobscd", StringType), StructField("attwl", DoubleType)))
    val prev = Seq(("A", 1.0), ("B", 2.0)).toDF("wlobscd", "attwl")
    val dim = HttpPollSource.refreshStationDim(spark,
      () => """{"content": [{"wlobscd": "B", "attwl": 9.0}, {"wlobscd": "C", "attwl": 3.0}]}""",
      stationSchema, Some(prev))
    val m = dim.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m === Map("A" -> 1.0, "B" -> 9.0, "C" -> 3.0))
  }

  test("open-schema station poll parses thresholds and keeps unknown fields") {
    val body =
      """{"content": [
        |  {"wlobscd": "1001602", "attwl": "3.0", "wrnwl": " ", "almwl": "oops", "srswl": "9.0",
        |   "obsnm": "서울", "agcnm": "agency", "lon": "127-02-00", "fstnyn": "Y"}
        |]}""".stripMargin
    val dim = graft.sources.HttpPollSource.pollStationsOpen(spark, () => body)
    val r = dim.collect()(0)
    assert(r.getAs[String]("wlobscd") === "1001602")
    assert(r.getAs[Double]("attwl") === 3.0 && r.getAs[Double]("srswl") === 9.0)
    assert(r.isNullAt(r.fieldIndex("wrnwl")) && r.isNullAt(r.fieldIndex("almwl")))
    val extra = r.getAs[Map[String, String]]("extra")
    assert(extra === Map("obsnm" -> "서울", "agcnm" -> "agency",
      "lon" -> "127-02-00", "fstnyn" -> "Y"))
  }

  // ---- K5/K6/K7 executed coverage without a broker --------------------
  // A MemoryStream drives the alert/DLQ frames through a real streaming
  // sink, asserting the exact key/value contract the kafka sink would
  // transport (AlertPublisher.java:45-67, DeadLetterQueueProducer.java:
  // 51-61). Swapping format("memory") for KafkaIO.topicSink is the only
  // delta a broker deployment needs — everything upstream is identical.

  test("K5 alert frame streams with key=observationCode and the alert JSON value") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[AlertInput]
    val frame = graft.sinks.Sinks.alertFrame(mem.toDF(), timestamp = lit(1700000000000L))
    assert(frame.columns.toSeq === Seq("key", "value")) // the kafka frame shape
    assert(frame.isStreaming)
    val q = frame.writeStream.format("memory").queryName("k5_out").outputMode("append").start()
    try {
      mem.addData(
        AlertInput("1001602", "2025-12-09 15:30", Some(1.23), Some(45.67), "WARNING",
          is_anomaly = false, "관측소 1001602에서 WARNING 수위 경보 (수위: 1.23 m)"),
        AlertInput("1001603", "2025-12-09 15:31", None, Some(2.0), "ANOMALY",
          is_anomaly = true, "관측소 1001603에서 이상치 감지 (수위 미계측)"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("k5_out")
    assert(out.orderBy("key").collect().map(_.getString(0)).toSeq ===
      Seq("1001602", "1001603"))
    val v = out.filter(col("key") === "1001602").select(
      get_json_object(col("value"), "$.observationCode").as("c"),
      get_json_object(col("value"), "$.observationTime").as("t"),
      get_json_object(col("value"), "$.waterLevel").as("wl"),
      get_json_object(col("value"), "$.flowRate").as("fw"),
      get_json_object(col("value"), "$.warningLevel").as("lvl"),
      get_json_object(col("value"), "$.isAnomaly").as("an"),
      get_json_object(col("value"), "$.message").as("msg"),
      get_json_object(col("value"), "$.timestamp").as("ts")).collect()(0)
    assert(v.getString(0) === "1001602" && v.getString(1) === "2025-12-09 15:30")
    assert(v.getString(2) === "1.23" && v.getString(3) === "45.67")
    assert(v.getString(4) === "WARNING" && v.getString(5) === "false")
    assert(v.getString(6).startsWith("관측소 1001602에서 WARNING"))
    assert(v.getString(7) === "1700000000000")
    // null measurement is omitted from the JSON (vs Java's explicit null —
    // both read back as absent on the consumer side)
    assert(out.filter(col("key") === "1001603")
      .select(get_json_object(col("value"), "$.waterLevel")).collect()(0).isNullAt(0))
  }

  test("K6 DLQ frame streams the camelCase envelope through a sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[DlqInput]
    val frame = graft.sinks.Sinks.dlqFrame(mem.toDF(),
      errorReason = "Storage failed for: archive", timestamp = lit(5L))
    assert(frame.columns.toSeq === Seq("originalKey", "originalValue", "errorReason",
      "exceptionClass", "exceptionMessage", "timestamp"))
    val q = frame.writeStream.format("memory").queryName("k6_out").outputMode("append").start()
    try {
      mem.addData(DlqInput("1001602", """{"k":"bad"}"""))
      q.processAllAvailable()
    } finally q.stop()
    val r = spark.table("k6_out").collect()(0)
    assert(r.getAs[String]("originalKey") === "1001602")
    assert(r.getAs[String]("originalValue") === """{"k":"bad"}""")
    assert(r.getAs[String]("errorReason") === "Storage failed for: archive")
    assert(r.getAs[String]("exceptionClass") === "StorageException")
    assert(r.getAs[Long]("timestamp") === 5L)
  }

  test("topicSink carries the full kafka producer option contract") {
    val opts = graft.sources.KafkaIO.topicSinkOptions(
      "broker:9092", "hrfco-alerts", "/tmp/ckpt")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "kafka.acks" -> "all",
      "topic" -> "hrfco-alerts",
      "checkpointLocation" -> "/tmp/ckpt"))
  }

  test("humanizeBytes matches the reference's unit breaks") {
    val got = Seq(512L, 2048L, 1280L, 5L * 1024 * 1024, 3L * 1024 * 1024 * 1024)
      .toDF("b").select(Monitoring.humanizeBytes(col("b")).as("h"))
      .collect().map(_.getString(0)).toSeq
    // 1280 B = exactly 1.25 KB: the dyadic tie must round half-up ("1.3")
    // in both engines (explicit floor rounding, not printf's half-even)
    assert(got === Seq("512 B", "2.0 KB", "1.3 KB", "5.0 MB", "3.0 GB"))
  }
}
