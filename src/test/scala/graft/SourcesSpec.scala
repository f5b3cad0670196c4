package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.HttpPollSource
import graft.ops.Monitoring

/** S2/S3 poll-source shape with an injected fake transport, plus the
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

  test("humanizeBytes matches the reference's unit breaks") {
    val got = Seq(512L, 2048L, 1280L, 5L * 1024 * 1024, 3L * 1024 * 1024 * 1024)
      .toDF("b").select(Monitoring.humanizeBytes(col("b")).as("h"))
      .collect().map(_.getString(0)).toSeq
    // 1280 B = exactly 1.25 KB: the dyadic tie must round half-up ("1.3")
    // in both engines (explicit floor rounding, not printf's half-even)
    assert(got === Seq("512 B", "2.0 KB", "1.3 KB", "5.0 MB", "3.0 GB"))
  }
}
