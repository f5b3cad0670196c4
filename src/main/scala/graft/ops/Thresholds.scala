package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived station/threshold dimension (the `observation_stations` role,
  * FIXTURES.md §B): deterministic per-station thresholds computed from the
  * event stream's own min/max — a stand-in for the reference's station
  * catalog (util/StationThresholdLoader.java:42-121). Branch coverage is
  * deliberate:
  *   - 'error'  : absent from the dim          → T11 "threshold row absent"
  *   - 'signup' : present, all thresholds null → validCount==0, NO_THRESHOLD
  *   - 'view'   : only srswl set               → validCount==1, PARTIAL_THRESHOLD
  *   - 'click'/'purchase': full quadruple      → cascade classification
  *
  * min/max + fixed-fraction arithmetic is bit-deterministic across engines
  * (unlike interpolated percentiles), which keeps the DuckDB oracle exact.
  * The dim is one row per station — always broadcast-sized.
  */
object Thresholds {
  private val Full = Seq("click", "purchase")

  def fromEvents(events: DataFrame): DataFrame = {
    val stats = events
      .groupBy(col("event_type").as("wlobscd"))
      .agg(min("value").as("mn"), max("value").as("mx"))
    def at(frac: Double, types: Seq[String]) =
      when(col("wlobscd").isin(types: _*), col("mn") + lit(frac) * (col("mx") - col("mn")))
    stats
      .filter(col("wlobscd") =!= "error")
      .select(
        col("wlobscd"),
        at(0.50, Full).as("attwl"),
        at(0.70, Full).as("wrnwl"),
        at(0.85, Full).as("almwl"),
        at(0.95, Full :+ "view").as("srswl"),
        concat(lit("station "), col("wlobscd")).as("obsnm"),
        concat(lit("addr "), col("wlobscd")).as("addr"))
  }
}
