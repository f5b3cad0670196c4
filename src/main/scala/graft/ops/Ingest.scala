package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion envelope handling (S2→T1→T2): the reference polls an HTTP API
  * whose body is `{"content": [ {record}, ... ]}` and splits it one record
  * per element (NiFi SplitJson `$.content`, EvaluateJsonPath `$.wlobscd` —
  * nifi/HRFCO_Data_Pipeline.json processors 6,7,1).
  *
  * With no network in CI, polls are reconstructed deterministically from
  * `events` (one envelope per `event_id DIV 10`), serialized with to_json,
  * then split back with from_json + explode — the same declarative shape a
  * real fetch-then-parse ingestion job uses (SURVEY.md §2.1 S2: the body
  * lands in a DataFrame and everything after is identical). */
object Ingest {

  private val recordSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private val envelopeSchema = StructType(Seq(
    StructField("content", ArrayType(recordSchema))))

  /** Build one JSON envelope per poll. sort_array on the (event_id-first)
    * struct makes the collect_list order deterministic. */
  def envelopes(events: DataFrame): DataFrame =
    events
      .groupBy(expr("event_id DIV 10").as("poll_id"))
      .agg(sort_array(collect_list(struct(
        col("event_id"), col("event_type"), col("value")))).as("content"))
      .select(col("poll_id"), to_json(struct(col("content"))).as("body"))

  /** T1+T2: split the envelope back into typed records. */
  def splitEnvelopes(envelopes: DataFrame): DataFrame =
    envelopes
      .select(explode(from_json(col("body"), envelopeSchema).getField("content")).as("rec"))
      .select(
        col("rec.event_id").as("event_id"),
        col("rec.event_type").as("event_type"),
        col("rec.value").as("value"))
}
