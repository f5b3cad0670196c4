package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All queries take the sf directory at call time so the same code runs at
  * any scale factor; at cluster scale these would be catalog tables with
  * partition pruning — here they are single parquet files per table.
  */
object Tables {
  /** Confs every graft session needs, applied at builder time by the
    * entrypoints (Bench/Verify/Smoke/PlanAudit/StreamingDemo/tests):
    * nanosAsLong stays set so a TIMESTAMP(NANOS) events regeneration
    * (the pre-round-9 encoding, which Spark 4 otherwise rejects) reads
    * as a raw long that `normalizeEvents` adapts to; on the current
    * timestamp[us] data the conf is a no-op. */
  val sessionConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Apply `sessionConfs` to a builder mechanically — every entrypoint goes
    * through here, so adding a conf above propagates everywhere at once. */
  def configured(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Fallback for externally-built sessions only: set once, not per load
    // (a per-load session-conf mutation races with concurrent planners).
    sessionConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Raw schema of the events parquet — needed by the streaming file
    * source, which requires an explicit schema. The driver currently
    * writes ts as parquet timestamp[us]; `normalizeEvents` also accepts
    * the earlier nanos-as-long encoding for batch reads. */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Normalize raw events: ts exposed both as a micro-precision timestamp
    * (`ts`) and epoch-micros long (`ts_us`, used for ordering/arithmetic).
    * Adaptive to how the driver encoded the column: a genuine parquet
    * timestamp[us] surfaces as TimestampType (current testdata), while a
    * TIMESTAMP(NANOS) column under `nanosAsLong` surfaces as a raw
    * epoch-nanos long (earlier testdata) — micros is the common precision
    * either way (DuckDB's oracle read also sees micros), so downstream
    * code computes only on `ts`/`ts_us` and never on raw nanos. */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) under nanosAsLong (earlier testdata)
        raw
          .withColumn("ts_us", expr("ts DIV 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampNTZType =>
        // parquet timestamp[us] with isAdjustedToUTC=false (current
        // testdata). The naive value IS the UTC instant (DuckDB reads it
        // the same way). Micros-since-epoch is computed as a pure NTZ
        // difference from the NTZ epoch — NO timezone enters anywhere
        // (to_utc_timestamp would first cast NTZ→Timestamp THROUGH the
        // session timezone, shifting ts_us on any non-UTC session), so
        // this is correct under ANY session timezone.
        raw
          .withColumn("ts_us",
            expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampType =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported type $other — expected long (nanos), timestamp, or timestamp_ntz")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEvents(load(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
}
