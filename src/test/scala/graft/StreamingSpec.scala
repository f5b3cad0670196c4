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

  test("dimension-refresh liveness: a mid-stream dim swap reclassifies on the next micro-batch") {
    // The reference refreshes the station dim on an independent 10-minute
    // NiFi upsert loop while the stream keeps running
    // (HRFCO_Data_Pipeline.json processors 1-8) — so swapping the snapshot
    // between triggers must change classification WITHOUT a stream
    // restart. Two identical single-row source files + maxFilesPerTrigger=1
    // force two micro-batches; the provider serves lenient thresholds to
    // the first and strict ones after, so the same observation must come
    // out NORMAL once and CRITICAL once.
    import spark.implicits._
    val base = new java.io.File("target/test-out").getAbsoluteFile.toPath
    Files.createDirectories(base)
    val work = Files.createTempDirectory(base, "dimswap").toString
    val srcDir = new java.io.File(s"$work/incoming"); srcDir.mkdirs()

    val ts = java.time.LocalDateTime.of(2025, 12, 9, 15, 30)
    def writeEvent(id: Long, name: String): Unit = {
      val staging = s"$work/stage_$name"
      Seq((id, ts, 42L, "click", 100.0, """{"k": "5.0"}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, new java.io.File(srcDir, s"$name.parquet").toPath)
    }
    writeEvent(1L, "a"); writeEvent(2L, "b")

    def dim(attwl: Double, wrnwl: Double, almwl: Double, srswl: Double) =
      Seq(("click", attwl, wrnwl, almwl, srswl, "station click", "addr click"))
        .toDF("wlobscd", "attwl", "wrnwl", "almwl", "srswl", "obsnm", "addr")
    val lenient = dim(900, 920, 950, 980) // wl=100 below everything → NORMAL
    val strict = dim(10, 20, 30, 40)      // wl=100 ≥ srswl → CRITICAL
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)

    val paths = StreamingPipeline.SinkPaths(
      s"$work/archive", s"$work/timeseries", s"$work/raw", s"$work/dlq")
    val q = StreamingPipeline.startWithDim(
      spark, srcDir.getAbsolutePath,
      () => if (calls.incrementAndGet() == 1) lenient else strict,
      paths, s"$work/ckpt", maxFilesPerTrigger = 1, wlMax = 300.0)
    assert(q.awaitTermination(120000), "streaming query timed out")

    assert(q.recentProgress.count(_.numInputRows > 0) === 2,
      "expected exactly two micro-batches")
    val out = spark.read.parquet(paths.timeseries)
      .select("flood_warning_level").as[String].collect().sorted.toSeq
    assert(out === Seq("CRITICAL", "NORMAL"),
      s"dim swap did not reclassify mid-stream: $out")
  }

  test("streaming at volume: sf0.1 through fanout+DLQ in backpressured micro-batches matches batch") {
    val base = new java.io.File("target/test-out").getAbsoluteFile.toPath
    Files.createDirectories(base)
    val work = Files.createTempDirectory(base, "streamvol").toString
    val source = "/root/testdata/sf0.1"
    val ev = Tables.events(spark, source)

    // split the raw events into 8 files so AvailableNow +
    // maxFilesPerTrigger=2 drives FOUR micro-batches — state (file-source
    // log, checkpoint) and output correctness must hold across batch
    // boundaries, not just on a single-batch run
    val srcDir = s"$work/incoming"
    spark.read.parquet(s"$source/events.parquet").repartition(8)
      .write.parquet(srcDir)

    val paths = StreamingPipeline.SinkPaths(
      s"$work/archive", s"$work/timeseries", s"$work/raw", s"$work/dlq")
    val q = StreamingPipeline.start(
      spark, srcDir, ev, paths, s"$work/ckpt", maxFilesPerTrigger = 2, wlMax = 300.0)
    assert(q.awaitTermination(300000), "streaming query timed out")

    // backpressure really split the work: >= 4 triggers, none of which
    // ingested the whole corpus (bounded per-trigger state/memory)
    val progresses = q.recentProgress.filter(_.numInputRows > 0)
    val total = progresses.map(_.numInputRows).sum
    assert(progresses.length >= 4, s"expected >= 4 micro-batches, got ${progresses.length}")
    assert(progresses.map(_.numInputRows).max < total,
      "a single trigger ingested the whole corpus — backpressure did not bound the batch")

    // exact output equality with the batch pipeline, both directions
    val streamed = spark.read.parquet(paths.timeseries)
      .select("observation_code", "water_level", "flow_rate", "is_anomaly", "flood_warning_level")
    val batch = graft.ops.Hrfco.pipeline(ev, Thresholds.fromEvents(ev), wlMax = 300.0)
      .select(col("wlobscd").as("observation_code"), col("water_level"),
        col("flow_rate"), col("is_anomaly"), col("flood_warning_level"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)

    // DLQ accumulated exactly the parse failures across all batches
    val expectedParseFailures = graft.ops.Hrfco.dlqEnvelope(
      graft.ops.Hrfco.rawObservations(ev)).count()
    assert(spark.read.parquet(paths.dlq).count() === expectedParseFailures)
    assert(expectedParseFailures > 0)
  }
}
