package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, processed in executor-side batches.
  *
  * The container layer is REAL: payloads carry genuine BMP / WAV headers
  * (both are pure header arithmetic — no codec libraries needed), built
  * with codegen'd expressions on the write side and parsed from the
  * actual bytes on the read side. `decodeHeader` recovers width/height
  * (BMP) and sample-rate/channels (WAV) from the byte stream, so the
  * decode path is exercised end-to-end: a wrong offset or endianness
  * breaks the oracle compare, not just a unit test.
  *
  * Only the FEATURE extractor below the container remains a deterministic
  * stand-in (`pseudoFeature`) — real pixel/PCM DSP needs image/audio
  * libraries this sandbox doesn't ship. The batch loop is the JVM
  * analogue of a vectorized-UDF body: amortize per-batch setup (decoder
  * init, buffer reuse) across `batchSize` records instead of paying it
  * per row.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("container", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Little-endian hex encoding of the low `nBytes` bytes of an integral
    * column — the byte-order workhorse for binary header construction
    * with nothing but built-in (codegen'd) expressions. */
  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(255L)), 2, "0")): _*)

  /** A valid BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40
    * bytes, width at offset 18, height at 22, both int32 LE) + `data` as
    * the pixel stream. 24bpp, uncompressed, 2835 ppm (the standard 72dpi
    * value). */
  def bmpPayload(width: Column, height: Column, data: Column): Column = {
    val dataSize = length(data)
    concat(
      unhex(concat(
        lit("424D"), leHex(dataSize + 54, 4), lit("0000000036000000"),
        lit("28000000"), leHex(width, 4), leHex(height, 4),
        lit("0100"), lit("1800"), lit("00000000"), leHex(dataSize, 4),
        lit("130B0000"), lit("130B0000"), lit("00000000"), lit("00000000"))),
      data)
  }

  /** A valid 16-bit PCM WAV: RIFF/fmt/data header (44 bytes, channels at
    * offset 22 int16 LE, sample rate at 24 int32 LE) + `data` as the
    * sample stream. */
  def wavPayload(sampleRate: Column, channels: Column, data: Column): Column = {
    val dataSize = length(data)
    concat(
      unhex(concat(
        lit("52494646"), leHex(dataSize + 36, 4), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"), leHex(channels, 2),
        leHex(sampleRate, 4), leHex(sampleRate * channels * 2, 4),
        leHex(channels * 2, 2), lit("1000"),
        lit("64617461"), leHex(dataSize, 4))),
      data)
  }

  /** documents → media frame: every payload is a real container — images
    * and video keyframes are BMPs carrying deterministic dimensions in
    * their headers, audio is WAV carrying sample-rate/channel metadata;
    * the document text stands in for the pixel/PCM body. Downstream
    * consumers recover the metadata from the BYTES (decodeHeader), not
    * from side columns. */
  def mediaFrame(docs: DataFrame): DataFrame = {
    val data = col("text").cast("binary")
    val width = (col("doc_id") % 640 + 64).cast("int")
    val height = (col("doc_id") % 480 + 48).cast("int")
    val sampleRate = (col("doc_id") % 8).cast("int") * 4000 + 8000
    val channels = (col("doc_id") % 2 + 1).cast("int")
    val mediaType = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(
      col("doc_id"), mediaType.as("media_type"),
      when(mediaType === "audio", wavPayload(sampleRate, channels, data))
        .otherwise(bmpPayload(width, height, data)).as("payload"))
  }

  /** Little-endian integer read of `nBytes` at 1-based byte offset `off`
    * — the exact mirror image of leHex on the write side, again nothing
    * but built-in codegen'd expressions (substring on binary → hex →
    * conv), so the header DECODE path stays inside WholeStageCodegen
    * instead of dropping to an RDD (the round-5 audit's nit: fixed-offset
    * header reads are Catalyst-expressible and don't belong behind the
    * codec seam). */
  private def leInt(p: Column, off: Int, nBytes: Int): Column =
    (0 until nBytes).map(i =>
      conv(hex(substring(p, off + i, 1)), 16, 10).cast("long") * lit(1L << (8 * i)))
      .reduce(_ + _).cast("int")

  /** Pure-expression header decode: magic sniff + fixed-offset LE field
    * reads per the BMP/WAV specs, straight off the payload BYTES. This is
    * the whole oracle-checked read path; only feature extraction (real
    * DSP) sits behind the batch seam in extractFeatures. */
  private def headerCols(p: Column): Seq[Column] = {
    val isBmp = (length(p) >= 54) && (hex(substring(p, 1, 2)) === lit("424D"))
    val isWav = (length(p) >= 44) && (hex(substring(p, 1, 4)) === lit("52494646")) &&
      (hex(substring(p, 9, 4)) === lit("57415645"))
    Seq(
      when(isBmp, "bmp").when(isWav, "wav").otherwise("unknown").as("container"),
      length(p).cast("int").as("n_bytes"),
      when(isBmp, leInt(p, 19, 4)).as("width"),        // int32 LE at offset 18
      when(isBmp, leInt(p, 23, 4)).as("height"),       // int32 LE at offset 22
      when(isWav, leInt(p, 25, 4)).as("sample_rate"),  // int32 LE at offset 24
      when(isWav, leInt(p, 23, 2)).as("channels"))     // int16 LE at offset 22
  }

  /** media → decoded container metadata, fully expression-side (codegen'd,
    * no RDD hop): (doc_id, media_type, container, n_bytes, width, height,
    * sample_rate, channels). */
  def decodeHeaders(media: DataFrame): DataFrame =
    media.select(Seq(col("doc_id"), col("media_type")) ++ headerCols(col("payload")): _*)

  /** Decoded container metadata: (container, width, height, sampleRate,
    * channels) — JVM twin of headerCols, kept as the executable spec of
    * the byte layout (golden-byte unit tests pin both to the same
    * offsets/endianness). */
  def decodeHeader(p: Array[Byte])
      : (String, Option[Int], Option[Int], Option[Int], Option[Int]) = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | (p(off + 1) & 0xff) << 8 |
        (p(off + 2) & 0xff) << 16 | (p(off + 3) & 0xff) << 24
    def le16(off: Int): Int = (p(off) & 0xff) | (p(off + 1) & 0xff) << 8
    if (p.length >= 54 && p(0) == 'B' && p(1) == 'M')
      ("bmp", Some(le32(18)), Some(le32(22)), None, None)
    else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
             p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
      ("wav", None, None, Some(le32(24)), Some(le16(22)))
    else ("unknown", None, None, None, None)
  }

  /** STUB: a real build runs DSP over the decoded pixel/PCM body; offline
    * we derive a deterministic 8-dim pseudo-feature from the bytes so the
    * plumbing stays testable. */
  private def pseudoFeature(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val j = i % 8
      acc(j) = (acc(j) * 31 + (payload(i) & 0xff)) % 1000003L
      i += 1
    }
    acc.map(_.toFloat / 1000003f)
  }

  /** Batch feature extraction over partitions: grouped iteration keeps
    * the streaming/memory profile of a vectorized UDF (no partition-sized
    * materialization beyond one batch). Header fields are decoded by the
    * EXPRESSION path (decodeHeaders — codegen'd, from the payload bytes);
    * only the feature DSP crosses the batch seam, which is exactly where
    * a real codec would init per batch. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val decoded = media.select(
      (Seq(col("doc_id"), col("media_type")) ++
        headerCols(col("payload")) :+ col("payload")): _*)
    val rdd = decoded.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the real codec once, here
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // fields 0-7: doc_id..channels pass through from the expression
          // decode; the seam only ADDS the feature vector
          Row.fromSeq(r.toSeq.init :+ (pseudoFeature(payload).toSeq: Any))
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: every strideth byte window of the payload — the
    * column-expression form (real frame extraction lives behind the same
    * batch seam as the header decode). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, nFrames: Int = 4): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      transform(sequence(lit(0), lit(nFrames - 1)),
        i => substring_index(base64(substr(col("payload"),
          i * (length(col("payload")) / nFrames) + 1, lit(frameBytes))), "=", 1)).as("frames"))
}
