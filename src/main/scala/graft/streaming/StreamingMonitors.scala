package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native forms of the monitoring operators:
  *
  *  - a watermarked tumbling-window aggregate (event-time, late data
  *    bounded by the watermark) — the windowed-stats surface;
  *  - the A6 delta/rate detector as keyed state via
  *    flatMapGroupsWithState: per-station last-observation state, emitting
  *    a delta record per event (the streaming equivalent of the batch
  *    `lag()` form in Monitoring.deltaRate).
  *
  * State is per-key and O(1) per station — at cluster scale the state
  * store shards by key, so a million stations cost a million tiny rows of
  * state, not driver memory.
  */
object StreamingMonitors {

  final case class StationEvent(event_type: String, event_id: Long, value: Double, ts_us: Long)
  final case class StationState(lastValue: Double, lastTsUs: Long)
  final case class DeltaRecord(event_type: String, event_id: Long, value: Double,
                               prev_value: Double, delta: Double,
                               rate_per_sec: Option[Double])

  /** Watermarked tumbling-window stats per station: counts and extrema
    * per hour of event time, tolerating 10 minutes of lateness. */
  def windowedStationStats(stream: DataFrame,
                           windowLength: String = "1 hour",
                           lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), windowLength))
      .agg(
        count(lit(1)).as("n_obs"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(
        col("event_type"),
        col("window.start").as("window_start"),
        col("n_obs"), col("min_value"), col("max_value"))

  /** Streaming exact dedup: drop re-deliveries of the same event within
    * the watermark horizon — the at-least-once-source companion. Must use
    * dropDuplicatesWithinWatermark: plain dropDuplicates on a non-event-
    * time key never GCs its state (one row per distinct id forever). */
  def dedupStream(stream: DataFrame, lateness: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")

  /** Keyed-state delta/rate: remembers the last observation per station
    * across batches and emits one delta record per subsequent event.
    * Events inside a batch are processed in event-time order. */
  def statefulDeltaRate(stream: DataFrame): Dataset[DeltaRecord] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("event_type"), col("event_id"), col("value"), col("ts_us"))
      .as[StationEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[StationEvent], state: GroupState[StationState]) =>
          val ordered = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = Seq.newBuilder[DeltaRecord]
          var cur = state.getOption
          ordered.foreach { e =>
            cur.foreach { prev =>
              val delta = e.value - prev.lastValue
              val gapSec = (e.ts_us - prev.lastTsUs) / 1.0e6
              // null (not NaN) on a zero gap — matches the batch lag() form
              val rate = if (gapSec == 0.0) None else Some(delta / gapSec)
              out += DeltaRecord(key, e.event_id, e.value, prev.lastValue, delta, rate)
            }
            cur = Some(StationState(e.value, e.ts_us))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
