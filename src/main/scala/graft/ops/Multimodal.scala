package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, decoded and featurized entirely by expressions.
  *
  * The container layer is REAL: payloads carry genuine BMP / WAV headers
  * (both are pure header arithmetic — no codec libraries needed), built
  * with codegen'd expressions on the write side and parsed from the
  * actual bytes on the read side. `decodeHeader` recovers width/height
  * (BMP) and sample-rate/channels (WAV) from the byte stream, so the
  * decode path is exercised end-to-end: a wrong offset or endianness
  * breaks the oracle compare, not just a unit test.
  *
  * The FEATURE layer is real DSP over the body bytes: per-channel
  * mean/std for BMP pixel streams, RMS + zero-crossing rate for WAV PCM
  * — codegen'd native expressions (graft.functions.{ByteChannelStats,
  * PcmStats}), so the whole decode→feature path runs inside
  * WholeStageCodegen with no RDD hop. What remains synthetic is only the
  * CONTENT (document text standing in for pixels/samples — the sandbox
  * ships no codec libraries to produce real media); the arithmetic is
  * the true feature math and is oracle-checked byte-for-byte.
  */
object Multimodal {

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
    * reads per the BMP/WAV specs, straight off the payload BYTES. The
    * feature DSP below (extractFeatures) is equally expression-side. */
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

  /** Feature extraction, pure expressions end to end: container sniffed
    * from the bytes picks the DSP — WAV bodies (16-bit LE PCM at offset
    * 44) yield [rms, zcr]; BMP bodies (24bpp interleaved at offset 54)
    * yield per-channel [mean_b, mean_g, mean_r, std_b, std_g, std_r].
    * The kernels accumulate in exact integers (see DspKernel), so the
    * doubles are bit-deterministic and DuckDB-mirrorable — q_multimodal
    * hash-checks them against an independent byte-stream recomputation.
    * No RDD seam remains: a real codec's per-batch init would sit behind
    * `mapInPandas`-style batching, but header parse and body DSP are
    * fixed-offset arithmetic, which is exactly what Catalyst codegen is
    * for. */
  def extractFeatures(media: DataFrame): DataFrame =
    media
      .select((Seq(col("doc_id"), col("media_type")) ++
        headerCols(col("payload")) :+ col("payload")): _*)
      .withColumn("feature",
        when(col("container") === "wav",
          graft.functions.MediaFunctions.pcmStats(col("payload"), offset = 44))
        .when(col("container") === "bmp",
          graft.functions.MediaFunctions.byteChannelStats(col("payload"), offset = 54, stride = 3)))
      .drop("payload")

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
