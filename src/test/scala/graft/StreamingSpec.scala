package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Hrfco, Thresholds}
import graft.streaming.StreamingPipeline

/** A micro-batch through the streaming wiring must match the batch
  * pipeline's output (same `ops` functions, so any divergence is wiring). */
class StreamingSpec extends SparkSpec {

  test("streaming pipeline over file source matches the batch pipeline") {
    val base = new java.io.File("target/test-out").getAbsoluteFile.toPath
    Files.createDirectories(base)
    val work = Files.createTempDirectory(base, "stream").toString
    val source = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, source)
    // the file stream source needs a directory of files
    val srcDir = new java.io.File(s"$work/incoming"); srcDir.mkdirs()
    Files.copy(new java.io.File(s"$source/events.parquet").toPath,
      new java.io.File(srcDir, "events.parquet").toPath)

    val paths = StreamingPipeline.SinkPaths(
      s"$work/archive", s"$work/timeseries", s"$work/raw", s"$work/dlq")
    val q = StreamingPipeline.start(
      spark, srcDir.getAbsolutePath, ev, paths, s"$work/ckpt", wlMax = 300.0)
    assert(q.awaitTermination(120000), "streaming query timed out")

    val streamed = spark.read.parquet(paths.timeseries)
    val batch = Hrfco.pipeline(ev, Thresholds.fromEvents(ev), wlMax = 300.0)
      .select(col("wlobscd").as("observation_code"), col("water_level"),
        col("flow_rate"), col("is_anomaly"), col("flood_warning_level"))

    assert(streamed.count() === batch.count())
    assert(streamed.select("observation_code", "water_level", "flow_rate",
      "is_anomaly", "flood_warning_level").exceptAll(batch).count() === 0)
    // DLQ holds exactly the parse failures (sink failures would append more)
    val dlq = spark.read.parquet(paths.dlq)
    val expectedParseFailures = graft.ops.Hrfco.dlqEnvelope(
      graft.ops.Hrfco.rawObservations(ev)).count()
    assert(dlq.count() === expectedParseFailures && expectedParseFailures > 0)
  }
}
