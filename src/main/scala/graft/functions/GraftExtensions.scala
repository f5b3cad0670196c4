package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the native expressions
  * available as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works for SQL-only users. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `GraftExtensions.register(spark)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // band-join rewrite: abs(x − y) <= d inner joins become bucketed
    // equi-joins instead of nested loops (graft.plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {
  /** Plan-time parameters (shingle width, signature bits) must be integer
    * literals, not data. */
  private def literalInt(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  /** A SQL call with the wrong argument count must fail at analysis with
    * the function's signature, not with an IndexOutOfBounds from the
    * builder. */
  private def arity2(fn: String, children: Seq[Expression]): Unit =
    if (children.size != 2) throw new IllegalArgumentException(
      s"$fn expects 2 arguments, got ${children.size}")

  private def arity3(fn: String, children: Seq[Expression]): Unit =
    if (children.size != 3) throw new IllegalArgumentException(
      s"$fn expects 3 arguments, got ${children.size}")

  private val functions = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        arity2("graft_dot(a, b)", children)
        DotProduct(children(0), children(1)): Expression
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        arity2("graft_shingles(text, n)", children)
        WordShingles(children.head, literalInt("graft_shingles(text, n)", children(1))): Expression
      }),
    (FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (children: Seq[Expression]) => {
        arity2("graft_minhash_sigs(shingles, numHashes)", children)
        MinHashSigs(children.head,
          literalInt("graft_minhash_sigs(shingles, numHashes)", children(1))): Expression
      }),
    (FunctionIdentifier("graft_srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_sig"),
      (children: Seq[Expression]) => {
        arity2("graft_srp_sig(vec, numBits)", children)
        SrpSignature(children.head, literalInt("graft_srp_sig(vec, numBits)", children(1))): Expression
      }),
    (FunctionIdentifier("graft_pcm_stats"),
      new ExpressionInfo(classOf[PcmStats].getName, "graft_pcm_stats"),
      (children: Seq[Expression]) => {
        arity2("graft_pcm_stats(payload, offset)", children)
        PcmStats(children.head, literalInt("graft_pcm_stats(payload, offset)", children(1))): Expression
      }),
    (FunctionIdentifier("graft_byte_channel_stats"),
      new ExpressionInfo(classOf[ByteChannelStats].getName, "graft_byte_channel_stats"),
      (children: Seq[Expression]) => {
        arity3("graft_byte_channel_stats(payload, offset, stride)", children)
        ByteChannelStats(children.head,
          literalInt("graft_byte_channel_stats(payload, offset, stride)", children(1)),
          literalInt("graft_byte_channel_stats(payload, offset, stride)", children(2))): Expression
      }),
    (FunctionIdentifier("graft_byte_channel_stats_at"),
      new ExpressionInfo(classOf[ByteChannelStatsAt].getName, "graft_byte_channel_stats_at"),
      (children: Seq[Expression]) => {
        val sig = "graft_byte_channel_stats_at(payload, offsetExpr, stride, tailTrim)"
        if (children.size != 4) throw new IllegalArgumentException(
          s"$sig expects 4 arguments, got ${children.size}")
        ByteChannelStatsAt(children(0), children(1),
          literalInt(sig, children(2)), literalInt(sig, children(3))): Expression
      }),
    (FunctionIdentifier("graft_jpeg_scan_stats"),
      new ExpressionInfo(classOf[JpegScanStats].getName, "graft_jpeg_scan_stats"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_jpeg_scan_stats(payload) expects 1 argument, got ${children.size}")
        JpegScanStats(children.head): Expression
      }),
    (FunctionIdentifier("graft_gzip_inflate"),
      new ExpressionInfo(classOf[GzipInflate].getName, "graft_gzip_inflate"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_gzip_inflate(payload) expects 1 argument, got ${children.size}")
        GzipInflate(children.head): Expression
      }),
    (FunctionIdentifier("graft_gzip_deflate"),
      new ExpressionInfo(classOf[GzipDeflate].getName, "graft_gzip_deflate"),
      (children: Seq[Expression]) => {
        arity2("graft_gzip_deflate(payload, level)", children)
        GzipDeflate(children.head,
          literalInt("graft_gzip_deflate(payload, level)", children(1))): Expression
      }),
    (FunctionIdentifier("graft_bmp_ahash"),
      new ExpressionInfo(classOf[BmpAHash].getName, "graft_bmp_ahash"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_bmp_ahash(payload) expects 1 argument, got ${children.size}")
        BmpAHash(children.head): Expression
      }),
    (FunctionIdentifier("graft_bmp_dhash"),
      new ExpressionInfo(classOf[BmpDHash].getName, "graft_bmp_dhash"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_bmp_dhash(payload) expects 1 argument, got ${children.size}")
        BmpDHash(children.head): Expression
      }),
    (FunctionIdentifier("graft_wav_dhash"),
      new ExpressionInfo(classOf[WavDHash].getName, "graft_wav_dhash"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_wav_dhash(payload) expects 1 argument, got ${children.size}")
        WavDHash(children.head): Expression
      }),
    (FunctionIdentifier("graft_tar_stats"),
      new ExpressionInfo(classOf[TarStats].getName, "graft_tar_stats"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_tar_stats(payload) expects 1 argument, got ${children.size}")
        TarStats(children.head): Expression
      }),
    (FunctionIdentifier("graft_tar_member_table"),
      new ExpressionInfo(classOf[TarMemberTable].getName, "graft_tar_member_table"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_tar_member_table(payload) expects 1 argument, got ${children.size}")
        TarMemberTable(children.head): Expression
      }),
    (FunctionIdentifier("graft_zip_stats"),
      new ExpressionInfo(classOf[ZipStats].getName, "graft_zip_stats"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_zip_stats(payload) expects 1 argument, got ${children.size}")
        ZipStats(children.head): Expression
      }),
    (FunctionIdentifier("graft_zip_entry_table"),
      new ExpressionInfo(classOf[ZipEntryTable].getName, "graft_zip_entry_table"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_zip_entry_table(payload) expects 1 argument, got ${children.size}")
        ZipEntryTable(children.head): Expression
      }),
    (FunctionIdentifier("graft_char_bigram_counts"),
      new ExpressionInfo(classOf[CharBigramCounts].getName, "graft_char_bigram_counts"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_char_bigram_counts(text) expects 1 argument, got ${children.size}")
        CharBigramCounts(children.head): Expression
      }),
    (FunctionIdentifier("graft_utf8_stats"),
      new ExpressionInfo(classOf[Utf8Stats].getName, "graft_utf8_stats"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_utf8_stats(bytes) expects 1 argument, got ${children.size}")
        Utf8Stats(children.head): Expression
      }),
    (FunctionIdentifier("graft_utf8_sanitize"),
      new ExpressionInfo(classOf[Utf8Sanitize].getName, "graft_utf8_sanitize"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new IllegalArgumentException(
          s"graft_utf8_sanitize(bytes) expects 1 argument, got ${children.size}")
        Utf8Sanitize(children.head): Expression
      }))

  /** Idempotent in-session registration (for sessions built without the
    * extensions config — e.g. the driver's own). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
