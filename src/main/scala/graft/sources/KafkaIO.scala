package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** S4/S5 + K5/K6/K7: Kafka wiring shapes (HRFCOStreamsApp.java:72-90,
  * KafkaConsumerConfig.java:33-63, AlertPublisher.java:43-82). The
  * spark-sql-kafka connector is not on this image's classpath and there is
  * no broker in CI, so these builders are the production configuration
  * path — exercised shapes are covered by the file-source streaming tests,
  * which share every operator downstream of the source. */
object KafkaIO {

  /** S4: the processor-side source — `earliest`, rate-limited per trigger
    * (the reference's NUM_STREAM_THREADS parallelism maps to Kafka
    * partition count on a cluster). */
  def waterLevelSource(spark: SparkSession, bootstrap: String,
                       topic: String = "hrfco-waterlevel",
                       maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()

  /** S5: the monitoring-side source — `latest` (KafkaConsumerConfig.java:39). */
  def alertSource(spark: SparkSession, bootstrap: String,
                  topic: String = "hrfco-alerts"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()

  /** The exact option set a K5/K6/K7 producer runs with (acks=all matches
    * the DLQ/NiFi producers) — exposed as data so tests can assert the
    * contract without a broker. */
  def topicSinkOptions(bootstrap: String, topic: String,
                       checkpoint: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "kafka.acks" -> "all",
    "topic" -> topic,
    "checkpointLocation" -> checkpoint)

  /** K5/K6/K7: key/value frame → Kafka topic. Feed with Sinks.alertFrame /
    * Sinks.dlqFrame. */
  def topicSink(frame: DataFrame, bootstrap: String, topic: String,
                checkpoint: String): DataStreamWriter[Row] =
    topicSinkOptions(bootstrap, topic, checkpoint)
      .foldLeft(frame.writeStream.format("kafka")) {
        case (w, (k, v)) => w.option(k, v)
      }
}
