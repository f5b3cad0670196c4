package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed in executor-side batches.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * iteration, fixed batch shape, feature schema — while the codec itself
  * is STUBBED with a deterministic fake (this container has no image/audio
  * libraries): `decodeStub` is the seam where a real implementation would
  * call the decoder per batch. The batch loop is the JVM analogue of a
  * vectorized-UDF body: amortize per-batch setup (codec init, buffer
  * reuse) across `batchSize` records instead of paying it per row.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** documents → media frame: payload is the utf-8 blob (stand-in for real
    * image/audio bytes), media_type/width/height are deterministic typed
    * metadata. */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"))

  /** STUB: a real build decodes the payload (JPEG/PCM/container frames)
    * and extracts features; offline we derive a deterministic 8-dim
    * pseudo-feature from the bytes so the plumbing is testable. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val j = i % 8
      acc(j) = (acc(j) * 31 + (payload(i) & 0xff)) % 1000003L
      i += 1
    }
    acc.map(_.toFloat / 1000003f)
  }

  /** Batch feature extraction over partitions: grouped iteration keeps the
    * streaming/memory profile of a vectorized UDF (no partition-sized
    * materialization beyond one batch). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media_type", "payload", "width", "height").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would init the codec once, here
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
              payload.length, r.getAs[Int]("width"), r.getAs[Int]("height"),
              decodeStub(payload).toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: every strideth byte window of the payload — the
    * column-expression form (real frame extraction lives behind the same
    * batch seam as decodeStub). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, nFrames: Int = 4): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      transform(sequence(lit(0), lit(nFrames - 1)),
        i => substring_index(base64(substr(col("payload"),
          i * (length(col("payload")) / nFrames) + 1, lit(frameBytes))), "=", 1)).as("frames"))
}
