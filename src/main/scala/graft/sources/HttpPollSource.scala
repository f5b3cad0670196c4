package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S2/S3: the reference's HTTP poll sources (NiFi InvokeHTTP on
  * `…/waterlevel/list/10M.json` and `…/waterlevel/info.json`;
  * StationThresholdLoader.java:44-51,126-155) re-expressed Spark-side.
  *
  * Spark has no HTTP source, and the poll result is tiny (one JSON body
  * per 10-minute tick) — so the correct shape is a driver-side fetch that
  * lands the body in a single-row Dataset and lets everything downstream
  * be ordinary DataFrame code. The transport is injectable (no network in
  * CI; in production pass a real client), which also matches the
  * reference's retry-wrapped callAPI seam.
  */
object HttpPollSource {

  /** One poll: fetch a JSON envelope `{"content": [...]}` and split it
    * into typed records (the S2→T1 chain; observation schema by default). */
  def pollObservations(spark: SparkSession, fetch: () => String,
                       recordSchema: StructType): DataFrame = {
    import spark.implicits._
    val body = fetch()
    Seq(body).toDF("body")
      .select(explode(from_json(col("body"),
        StructType(Seq(org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.ArrayType(recordSchema))))).getField("content")).as("rec"))
      .select(col("rec.*"))
  }

  /** S3 with the reference's store-everything semantics
    * (StationThresholdLoader.java:74-99): the four threshold fields are
    * parsed to nullable doubles (blank/garbage → null), wlobscd is the
    * key, and EVERY other field survives as-is in an open string map —
    * the dynamic-schema side of the dimension. */
  def pollStationsOpen(spark: SparkSession, fetch: () => String): DataFrame = {
    import spark.implicits._
    val body = fetch()
    val known = Seq("wlobscd", "attwl", "wrnwl", "almwl", "srswl")
    Seq(body).toDF("body")
      .select(explode(expr(
        "from_json(get_json_object(body, '$.content'), 'ARRAY<MAP<STRING,STRING>>')")).as("rec"))
      .select(
        col("rec")("wlobscd").as("wlobscd"),
        graft.ops.Hrfco.guardedDouble(col("rec")("attwl")).as("attwl"),
        graft.ops.Hrfco.guardedDouble(col("rec")("wrnwl")).as("wrnwl"),
        graft.ops.Hrfco.guardedDouble(col("rec")("almwl")).as("almwl"),
        graft.ops.Hrfco.guardedDouble(col("rec")("srswl")).as("srswl"),
        map_filter(col("rec"), (k, _) => known.map(n => k =!= n).reduce(_ && _)).as("extra"))
  }

  /** S3: station-info poll → dimension refresh. Returns the new dim
    * snapshot merged over the previous one (K4 upsert semantics), ready to
    * broadcast. */
  def refreshStationDim(spark: SparkSession, fetch: () => String,
                        stationSchema: StructType, previous: Option[DataFrame]): DataFrame = {
    val fresh = pollObservations(spark, fetch, stationSchema)
    previous match {
      case Some(prev) => graft.sinks.Sinks.upsertDim(prev, fresh)
      case None => fresh
    }
  }
}
