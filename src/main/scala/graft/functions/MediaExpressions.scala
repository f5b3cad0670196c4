package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Real DSP kernels for the multimodal feature path — the math a feature
  * extractor actually runs over decoded media bodies, expressed so the
  * result is bit-deterministic across engines (all accumulation in exact
  * integers; ONE double division and ONE correctly-rounded sqrt at the
  * end, the same shape a DuckDB oracle computes with HUGEINT sums).
  *
  * These replace the round-6 `pseudoFeature` stand-in: BMP pixel streams
  * get per-channel mean/std, WAV PCM gets RMS and zero-crossing rate.
  * What remains non-real is only the upstream content (document text
  * standing in for pixels/samples) — the arithmetic is the true DSP.
  */
object DspKernel {

  /** [rms, zcr] over signed 16-bit little-endian PCM starting at byte
    * `offset` (0-based). A trailing odd byte is ignored (not a sample).
    * rms = sqrt(sum(s²)/n) with the sum held exactly in a long. Worst case
    * (every sample full-scale -32768, s² = 2³⁰) the sum overflows at
    * ~8.6e9 samples ≈ 17 GB of body — beyond the JVM's ~2.1 GB per-array
    * cap on `p`, so the identity is exact for every representable input;
    * zcr counts sign boundaries between consecutive samples (s >= 0 vs
    * s < 0) over n-1 transitions, 0.0 for a single sample. Returns null
    * when no complete sample exists. */
  def pcmStats(p: Array[Byte], offset: Int): GenericArrayData = {
    val n = (p.length - offset) / 2
    if (n <= 0) return null
    var sumSq = 0L
    var crossings = 0L
    var prevNonNeg = false
    var k = 0
    while (k < n) {
      val lo = p(offset + 2 * k) & 0xff
      val s = (p(offset + 2 * k + 1) << 8) | lo // signed high byte: signed int16
      sumSq += s.toLong * s
      val nonNeg = s >= 0
      if (k > 0 && nonNeg != prevNonNeg) crossings += 1
      prevNonNeg = nonNeg
      k += 1
    }
    val rms = math.sqrt(sumSq.toDouble / n)
    val zcr = if (n < 2) 0.0 else crossings.toDouble / (n - 1)
    new GenericArrayData(Array(rms, zcr))
  }

  /** Largest per-channel count for which the variance identity provably
    * stays in Long: with v ≤ 255, both n·Σv² and (Σv)² are ≤ 65025·n²,
    * which fits in a signed 64-bit only while
    * n ≤ ⌊√(Long.Max/65025)⌋ = 11_909_896. Strictly, two's-complement
    * wrap cancels in the SUBTRACTION (exact mod 2^64), so the identity
    * only truly breaks once the difference n²·Var itself exceeds 2^63 —
    * n ≈ 2.4e7 at maximal variance — but that bound is data-dependent;
    * the guard uses the conservative intermediate-safe bound, which is
    * still well within the JVM's ~2.1 GB array cap (a stride-1 body
    * reaches it), so the overflow IS reachable and IS guarded. */
  private val ChannelCountLongSafe = 11909896L

  /** [mean_0..stride-1, std_0..stride-1] over unsigned bytes from `offset`,
    * channel = byte index mod stride (BMP 24bpp: stride 3 = B,G,R).
    * Population std via the exact integer identity n·Σv² − (Σv)², divided
    * by n² as ONE double division so the oracle's HUGEINT arithmetic lands
    * on the identical double. Channels with more than
    * [[ChannelCountLongSafe]] bytes take an exact BigInteger path (the
    * Long products would silently wrap to a wrong std or NaN while the
    * oracle's int128 stays exact); the per-byte accumulators themselves
    * are Long-safe to the array cap (Σv² ≤ 65025·n ≤ 1.4e14). Returns
    * null when fewer than `stride` bytes remain (some channel would be
    * empty). */
  def byteChannelStats(p: Array[Byte], offset: Int, stride: Int): GenericArrayData =
    byteChannelStatsRange(p, offset, stride, p.length)

  /** [[byteChannelStats]] over the half-open byte range [offset, end) —
    * the form a container with a TRAILING marker needs (JPEG bodies end
    * 2 bytes before the payload: the EOI marker is framing, not pixels).
    * `end` is clamped to the payload; null when some channel would be
    * empty. */
  def byteChannelStatsRange(p: Array[Byte], offset: Int, stride: Int,
                            end: Int): GenericArrayData = {
    val stop = math.min(end, p.length)
    if (offset < 0 || stop - offset < stride) return null
    val sum = new Array[Long](stride)
    val sumSq = new Array[Long](stride)
    val cnt = new Array[Long](stride)
    var i = offset
    while (i < stop) {
      val c = (i - offset) % stride
      val v = (p(i) & 0xff).toLong
      sum(c) += v
      sumSq(c) += v * v
      cnt(c) += 1
      i += 1
    }
    val out = new Array[Double](2 * stride)
    var c = 0
    while (c < stride) {
      val n = cnt(c)
      out(c) = sum(c).toDouble / n
      out(stride + c) =
        if (n <= ChannelCountLongSafe)
          math.sqrt((n * sumSq(c) - sum(c) * sum(c)).toDouble / (n * n).toDouble)
        else {
          val bn = java.math.BigInteger.valueOf(n)
          val num = bn.multiply(java.math.BigInteger.valueOf(sumSq(c)))
            .subtract(java.math.BigInteger.valueOf(sum(c)).pow(2))
          math.sqrt(num.doubleValue() / bn.pow(2).doubleValue())
        }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Full JPEG marker-stream statistics per ITU T.81: walk every
    * length-prefixed segment from SOI to EOI, counting quantization
    * (DQT) and Huffman (DHT) table segments, and measure each
    * entropy-coded SCAN — the length-LESS region after an SOS header
    * that a reader must terminate by byte-scanning for the next true
    * marker, honoring §B.1.1.5 framing: 0xFF00 is a STUFFED data byte
    * and FFD0-D7 (RSTn) are restart markers, both part of the scan;
    * any other FFxx ends it. Returns
    * [n_dqt, n_dht, n_scans, scan_bytes_total, scan_min, scan_max]
    * (min/max 0 when no scan), or null for a non-JPEG payload or any
    * malformed stream (truncated segment, lost marker alignment, scan
    * running off the end) — never a read at a garbage offset. */
  def jpegScanStats(p: Array[Byte]): GenericArrayData = {
    if (p.length < 4 || (p(0) & 0xff) != 0xFF || (p(1) & 0xff) != 0xD8) return null
    var pos = 2
    var nDqt = 0L
    var nDht = 0L
    var nSos = 0L
    var total = 0L
    var minScan = Long.MaxValue
    var maxScan = 0L
    var done = false
    while (!done) {
      if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xFF) return null
      val m = p(pos + 1) & 0xff
      if (m == 0xFF) pos += 1 // optional fill byte before a marker (§B.1.1.2)
      else if (m == 0xD9) done = true // EOI
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) pos += 2 // standalone
      else if (m == 0xDA) {
        if (pos + 3 >= p.length) return null
        val hdr = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
        if (hdr < 2) return null
        var k = pos + 2 + hdr
        val start = k
        var scanning = true
        while (scanning) {
          if (k >= p.length) return null // scan ran off the end
          if ((p(k) & 0xff) == 0xFF) {
            if (k + 1 >= p.length) return null // marker cut off
            val m2 = p(k + 1) & 0xff
            if (m2 == 0x00 || (m2 >= 0xD0 && m2 <= 0xD7)) k += 2
            else scanning = false
          } else k += 1
        }
        val scanLen = (k - start).toLong
        nSos += 1
        total += scanLen
        if (scanLen < minScan) minScan = scanLen
        if (scanLen > maxScan) maxScan = scanLen
        pos = k
      } else {
        if (pos + 3 >= p.length) return null
        val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
        if (len < 2) return null
        if (m == 0xDB) nDqt += 1
        if (m == 0xC4) nDht += 1
        pos += 2 + len
      }
    }
    new GenericArrayData(Array(nDqt, nDht, nSos, total,
      if (nSos == 0) 0L else minScan, maxScan))
  }

  /** Full PNG chunk walk honoring the ISO/IEC 15948 §5 file structure:
    * 8-byte signature, then length/type/data/CRC-framed chunks to IEND.
    * Per chunk the CRC-32 (the zlib polynomial, computed over type+data)
    * is RECOMPUTED and compared against the stored field — `crcBad`
    * counts mismatches, so a payload built with Spark's `crc32` proves
    * the builder and this walk agree bit-for-bit, and a corrupted byte
    * anywhere in a chunk is visible without decoding anything. Returns
    * [width, height, bit_depth, color_type, interlace, n_chunks, n_idat,
    * idat_bytes_total, crc_bad], or null for a non-PNG payload or any
    * malformed stream (bad signature, IHDR not first or mis-sized,
    * non-alphabetic chunk type, length past the buffer, truncated CRC,
    * bytes after IEND) — never a read at a garbage offset. */
  def pngChunkStats(p: Array[Byte]): GenericArrayData = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (p.length < 8) return null
    var i = 0
    while (i < 8) { if ((p(i) & 0xff) != sig(i)) return null; i += 1 }
    var pos = 8
    var nChunks = 0L
    var nIdat = 0L
    var idatTotal = 0L
    var crcBad = 0L
    var width = 0L; var height = 0L
    var bitDepth = 0L; var colorType = 0L; var interlace = 0L
    var sawIhdr = false
    var done = false
    while (!done) {
      if (pos + 8 > p.length) return null // no room for length + type
      val clen = ((p(pos) & 0xffL) << 24) | ((p(pos + 1) & 0xffL) << 16) |
        ((p(pos + 2) & 0xffL) << 8) | (p(pos + 3) & 0xffL)
      if (clen > Int.MaxValue) return null // §5.3: length caps at 2^31-1
      if (pos + 12 + clen > p.length) return null // data + CRC truncated
      var t = 0
      while (t < 4) { // type bytes must be ASCII letters (§5.4)
        val b = p(pos + 4 + t) & 0xff
        if (!((b >= 65 && b <= 90) || (b >= 97 && b <= 122))) return null
        t += 1
      }
      val crc = new java.util.zip.CRC32
      crc.update(p, pos + 4, 4 + clen.toInt)
      val storedOff = pos + 8 + clen.toInt
      val stored = ((p(storedOff) & 0xffL) << 24) | ((p(storedOff + 1) & 0xffL) << 16) |
        ((p(storedOff + 2) & 0xffL) << 8) | (p(storedOff + 3) & 0xffL)
      if (crc.getValue != stored) crcBad += 1
      val ty = new String(p, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      nChunks += 1
      if (ty == "IHDR") {
        if (pos != 8 || clen != 13) return null // IHDR must be first, 13 bytes
        val d = pos + 8
        width = ((p(d) & 0xffL) << 24) | ((p(d + 1) & 0xffL) << 16) |
          ((p(d + 2) & 0xffL) << 8) | (p(d + 3) & 0xffL)
        height = ((p(d + 4) & 0xffL) << 24) | ((p(d + 5) & 0xffL) << 16) |
          ((p(d + 6) & 0xffL) << 8) | (p(d + 7) & 0xffL)
        bitDepth = p(d + 8) & 0xffL
        colorType = p(d + 9) & 0xffL
        interlace = p(d + 12) & 0xffL
        sawIhdr = true
      } else if (pos == 8) return null // first chunk must be IHDR
      else if (ty == "IDAT") { nIdat += 1; idatTotal += clen }
      else if (ty == "IEND") {
        if (clen != 0) return null
        if (storedOff + 4 != p.length) return null // trailing bytes after IEND
        done = true
      }
      pos = storedOff + 4
    }
    if (!sawIhdr) return null
    new GenericArrayData(Array(width, height, bitDepth, colorType, interlace,
      nChunks, nIdat, idatTotal, crcBad))
  }

  /** Adversarial-input bound on the ISO-BMFF walk: a stream can't make
    * the walk visit more boxes than this before being declared
    * malformed. Real files sit orders of magnitude below it (a box
    * costs ≥ 8 bytes, so 4096 boxes already needs a 32 KB stream built
    * almost entirely of empty boxes). */
  private val Mp4MaxBoxes = 4096L

  /** Full ISO-BMFF (MP4) box walk per ISO/IEC 14496-12 §4.2: every box
    * is size(4 BE)/type(4CC) framed, size==1 switching to a 64-bit
    * largesize and size==0 meaning to-end-of-file (top level, last box
    * only). The walk requires `ftyp` first (§4.3), descends ONE
    * container level — `moov`'s children, which must tile its payload
    * exactly — parses `mvhd` (version 0 or 1 field layouts) for
    * timescale/duration, counts `trak` children, and totals `mdat`
    * payload bytes across the top level. Returns
    * [timescale, duration, n_trak, n_boxes, n_mdat, mdat_bytes_total]
    * (n_boxes = top-level boxes + moov children), or null for a
    * non-BMFF payload or any malformed stream: truncated header, size
    * < 8 (or largesize < 16), a box past the buffer, a child that
    * doesn't tile moov, a second moov or mvhd, a missing/short/
    * unknown-version mvhd, or a walk past [[Mp4MaxBoxes]] — never a
    * read at a garbage offset. */
  def mp4BoxStats(p: Array[Byte]): GenericArrayData = {
    val n = p.length
    def u32(o: Int): Long = ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def is(o: Int, t: String): Boolean =
      (p(o) & 0xff) == t.charAt(0).toInt && (p(o + 1) & 0xff) == t.charAt(1).toInt &&
        (p(o + 2) & 0xff) == t.charAt(2).toInt && (p(o + 3) & 0xff) == t.charAt(3).toInt
    if (n < 16 || !is(4, "ftyp")) return null
    var pos = 0
    var boxes = 0L
    var nMdat = 0L; var mdatTotal = 0L; var nTrak = 0L
    var timescale = 0L; var duration = 0L
    var sawMoov = false
    while (pos < n) {
      boxes += 1
      if (boxes > Mp4MaxBoxes) return null
      if (pos + 8 > n) return null
      var size = u32(pos)
      var hdr = 8
      if (size == 1L) {
        if (pos + 16 > n) return null
        size = u64(pos + 8); hdr = 16
        if (size < 16L) return null // also rejects the sign-wrapped huge
      } else if (size == 0L) {
        size = (n - pos).toLong // §4.2: extends to end of file
        if (size < 8L) return null
      } else if (size < 8L) return null
      if (size > (n - pos).toLong) return null
      if (is(pos + 4, "mdat")) { nMdat += 1; mdatTotal += size - hdr }
      else if (is(pos + 4, "moov")) {
        if (sawMoov) return null
        sawMoov = true
        var c = pos + hdr
        val end = pos + size.toInt
        var sawMvhd = false
        while (c < end) {
          boxes += 1
          if (boxes > Mp4MaxBoxes) return null
          if (c + 8 > end) return null
          var cs = u32(c)
          var chdr = 8
          if (cs == 1L) {
            if (c + 16 > end) return null
            cs = u64(c + 8); chdr = 16
            if (cs < 16L) return null
          } else if (cs < 8L) return null // size-0 is top-level-only
          if (cs > (end - c).toLong) return null
          if (is(c + 4, "mvhd")) {
            if (sawMvhd) return null
            sawMvhd = true
            if (cs < chdr + 4) return null
            val ver = p(c + chdr) & 0xff
            if (ver == 0) { // vf(4) cre(4) mod(4) ts(4) dur(4)
              if (cs < chdr + 20) return null
              timescale = u32(c + chdr + 12)
              duration = u32(c + chdr + 16)
            } else if (ver == 1) { // vf(4) cre(8) mod(8) ts(4) dur(8)
              if (cs < chdr + 32) return null
              timescale = u32(c + chdr + 20)
              duration = u64(c + chdr + 24)
            } else return null
          } else if (is(c + 4, "trak")) nTrak += 1
          c += cs.toInt
        }
        if (c != end) return null // children must tile moov exactly
        if (!sawMvhd) return null
      }
      pos += size.toInt
    }
    if (!sawMoov) return null
    new GenericArrayData(Array(timescale, duration, nTrak, boxes, nMdat, mdatTotal))
  }

  /** Per-channel [means..., stds...] over the CONCATENATED mdat payloads
    * of an ISO-BMFF stream — the feature step of the MP4 seam, the
    * byteChannelStats arithmetic applied to the body a box walk locates
    * (channel = GLOBAL body index mod stride, so a body split across
    * mdat boxes featurizes identically to the unsplit body). Framing
    * honors the same §4.2 rules as [[mp4BoxStats]]'s top level (ftyp
    * first, size/largesize/size-0, the hop bound); moov's interior is
    * opaque here — features need only the top-level tiling. Null for
    * non-BMFF/malformed streams or an empty body (some channel would be
    * empty below `stride` bytes). Exact-integer accumulation with the
    * byteChannelStats identity and the same BigInteger guard. */
  def mp4MdatChannelStats(p: Array[Byte], stride: Int): GenericArrayData = {
    val n = p.length
    def u32(o: Int): Long = ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def is(o: Int, t: String): Boolean =
      (p(o) & 0xff) == t.charAt(0).toInt && (p(o + 1) & 0xff) == t.charAt(1).toInt &&
        (p(o + 2) & 0xff) == t.charAt(2).toInt && (p(o + 3) & 0xffL) == t.charAt(3).toInt
    if (n < 16 || !is(4, "ftyp")) return null
    val sum = new Array[Long](stride)
    val sumSq = new Array[Long](stride)
    val cnt = new Array[Long](stride)
    var body = 0L // global body index — spans mdat boundaries
    var pos = 0
    var boxes = 0L
    while (pos < n) {
      boxes += 1
      if (boxes > Mp4MaxBoxes) return null
      if (pos + 8 > n) return null
      var size = u32(pos)
      var hdr = 8
      if (size == 1L) {
        if (pos + 16 > n) return null
        size = u64(pos + 8); hdr = 16
        if (size < 16L) return null
      } else if (size == 0L) {
        size = (n - pos).toLong
        if (size < 8L) return null
      } else if (size < 8L) return null
      if (size > (n - pos).toLong) return null
      if (is(pos + 4, "mdat")) {
        var i = pos + hdr
        val stop = pos + size.toInt
        while (i < stop) {
          val c = (body % stride).toInt
          val v = (p(i) & 0xff).toLong
          sum(c) += v; sumSq(c) += v * v; cnt(c) += 1
          body += 1; i += 1
        }
      }
      pos += size.toInt
    }
    if (body < stride) return null // some channel empty
    val out = new Array[Double](2 * stride)
    var c = 0
    while (c < stride) {
      val m = cnt(c)
      out(c) = sum(c).toDouble / m
      out(stride + c) =
        if (m <= ChannelCountLongSafe)
          math.sqrt((m * sumSq(c) - sum(c) * sum(c)).toDouble / (m * m).toDouble)
        else {
          val bn = java.math.BigInteger.valueOf(m)
          val num = bn.multiply(java.math.BigInteger.valueOf(sumSq(c)))
            .subtract(java.math.BigInteger.valueOf(sum(c)).pow(2))
          math.sqrt(num.doubleValue() / bn.pow(2).doubleValue())
        }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Adversarial-input bound on the WARC walk — the Mp4MaxBoxes
    * discipline: a record costs ≥ ~30 bytes of mandatory framing, so
    * 4096 records already needs a ~120 KB stream of empty records. */
  private val WarcMaxRecords = 4096L

  /** Per-record WARC table — the same walk as [[warcStats]] but
    * emitting one (type_code, content_length, payload_offset) triple
    * per record, flattened into one long array (record i at indices
    * 3i..3i+2): type_code 0=warcinfo 1=response 2=request 3=metadata
    * 4=other, payload_offset the 0-BASED byte offset of the record's
    * first payload byte — exactly what a reader needs to slice payloads
    * out of the raw stream without re-parsing. Same malformation rules
    * and hop bound as the census walk: null, never a partial table. */
  def warcRecordTable(p: Array[Byte]): GenericArrayData = {
    val stats = warcStats(p)
    if (stats == null) return null
    // second pass collects the per-record geometry; the first pass
    // already certified the stream well-formed, so this walk cannot
    // fail — it re-derives offsets with the identical scan rules
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = p.length
    def eol(from: Int): Int = {
      var i = from
      while (i + 1 < n) {
        if (p(i) == '\r' && p(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    def eqIgnoreCase(from: Int, until: Int, s: String): Boolean = {
      if (until - from != s.length) return false
      var i = 0
      while (i < s.length) {
        val c = p(from + i) & 0xff
        val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
        if (lc != s.charAt(i).toInt) return false
        i += 1
      }
      true
    }
    var pos = 0
    while (pos < n) {
      pos = eol(pos + 5) + 2 // past the version line
      var clen = 0L
      var typ = 4
      var headersDone = false
      while (!headersDone) {
        if (p(pos) == '\r' && p(pos + 1) == '\n') { pos += 2; headersDone = true }
        else {
          val le = eol(pos)
          var colon = pos
          while (p(colon) != ':') colon += 1
          var vs = colon + 1
          while (vs < le && (p(vs) == ' ' || p(vs) == '\t')) vs += 1
          if (eqIgnoreCase(pos, colon, "content-length")) {
            var v = 0L
            var i = vs
            while (i < le) { v = v * 10 + (p(i) - '0'); i += 1 }
            clen = v
          } else if (eqIgnoreCase(pos, colon, "warc-type")) {
            typ =
              if (eqIgnoreCase(vs, le, "warcinfo")) 0
              else if (eqIgnoreCase(vs, le, "response")) 1
              else if (eqIgnoreCase(vs, le, "request")) 2
              else if (eqIgnoreCase(vs, le, "metadata")) 3
              else 4
          }
          pos = le + 2
        }
      }
      out += typ.toLong
      out += clen
      out += pos.toLong
      pos += clen.toInt + 4
    }
    new GenericArrayData(out.toArray)
  }

  /** Full WARC (ISO 28500) record walk: every record is a
    * `WARC/1.x` version line, named `Header: value` lines up to a blank
    * line, a `Content-Length`-framed payload, and a CRLF CRLF
    * terminator; records concatenate to end-of-stream. Returns
    * [n_records, n_warcinfo, n_response, n_request, n_metadata,
    * n_other, payload_bytes, header_bytes] where header_bytes is every
    * consumed non-payload byte (version lines, headers, blank lines,
    * terminators) — so payload_bytes + header_bytes == stream length
    * on success. Null (never a throw, never a garbage-offset read) for:
    * a non-WARC prefix, an unterminated line, a header line without a
    * colon, a missing/non-numeric/oversized Content-Length, a payload
    * past the buffer, a missing terminator, or a walk past
    * [[WarcMaxRecords]]. Header names match case-insensitively (the
    * spec's rule); values take optional leading spaces/tabs.
    *
    * Documented limitations vs full ISO 28500 captures: (1) folded
    * (continuation) header lines — a line starting with space/tab — are
    * treated as malformed, not joined to the previous value (the
    * synthetic corpus never folds; a real-capture walker would consume
    * them); (2) the walk reads the UNCOMPRESSED stream — real
    * Common-Crawl `.warc.gz` arrives as one gzip member per record, so
    * point the gzip member walk ([[gzipMemberStats]]) at the on-disk
    * bytes first. */
  def warcStats(p: Array[Byte]): GenericArrayData = {
    val n = p.length
    // CRLF scan from `from` (exclusive upper bound n): index of '\r' of
    // the first "\r\n", or -1
    def eol(from: Int): Int = {
      var i = from
      while (i + 1 < n) {
        if (p(i) == '\r' && p(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    def eqIgnoreCase(from: Int, until: Int, s: String): Boolean = {
      if (until - from != s.length) return false
      var i = 0
      while (i < s.length) {
        val c = p(from + i) & 0xff
        val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
        if (lc != s.charAt(i).toInt) return false
        i += 1
      }
      true
    }
    var pos = 0
    var recs = 0L
    var winfo = 0L; var resp = 0L; var req = 0L; var meta = 0L; var other = 0L
    var payloadBytes = 0L
    if (n < 10) return null
    while (pos < n) {
      recs += 1
      if (recs > WarcMaxRecords) return null
      val recStart = pos
      // version line: "WARC/" + anything to CRLF (1.0/1.1 both walk)
      if (pos + 5 > n || p(pos) != 'W' || p(pos + 1) != 'A' ||
        p(pos + 2) != 'R' || p(pos + 3) != 'C' || p(pos + 4) != '/') return null
      val ve = eol(pos + 5)
      if (ve < 0) return null
      pos = ve + 2
      var clen = -1L
      var typ = -1
      var headersDone = false
      while (!headersDone) {
        if (pos + 2 > n) return null
        if (p(pos) == '\r' && p(pos + 1) == '\n') { pos += 2; headersDone = true }
        else {
          val le = eol(pos)
          if (le < 0) return null
          // split on the first ':'
          var colon = pos
          while (colon < le && p(colon) != ':') colon += 1
          if (colon >= le) return null
          var vs = colon + 1
          while (vs < le && (p(vs) == ' ' || p(vs) == '\t')) vs += 1
          if (eqIgnoreCase(pos, colon, "content-length")) {
            if (vs >= le || le - vs > 18) return null // empty or > 18 digits
            var v = 0L
            var i = vs
            while (i < le) {
              val d = p(i) - '0'
              if (d < 0 || d > 9) return null
              v = v * 10 + d
              i += 1
            }
            clen = v
          } else if (eqIgnoreCase(pos, colon, "warc-type")) {
            typ =
              if (eqIgnoreCase(vs, le, "warcinfo")) 0
              else if (eqIgnoreCase(vs, le, "response")) 1
              else if (eqIgnoreCase(vs, le, "request")) 2
              else if (eqIgnoreCase(vs, le, "metadata")) 3
              else 4
          }
          pos = le + 2
        }
      }
      if (clen < 0L || clen > (n - pos).toLong) return null
      payloadBytes += clen
      pos += clen.toInt
      if (pos + 4 > n || p(pos) != '\r' || p(pos + 1) != '\n' ||
        p(pos + 2) != '\r' || p(pos + 3) != '\n') return null
      pos += 4
      typ match {
        case 0 => winfo += 1
        case 1 => resp += 1
        case 2 => req += 1
        case 3 => meta += 1
        case _ => other += 1
      }
      // defensive: every branch above consumed ≥ 1 byte, but the hop
      // bound plus this keeps the loop provably finite
      if (pos <= recStart) return null
    }
    new GenericArrayData(Array(recs, winfo, resp, req, meta, other,
      payloadBytes, n.toLong - payloadBytes))
  }

  /** Adversarial-input bound on the gzip walks — the WarcMaxRecords
    * discipline: a member costs ≥ 23 bytes of mandatory framing
    * (10 header + 5 empty stored block + 8 trailer), so 4096 members
    * already needs a ~94 KB stream of empty members. */
  private val GzipMaxMembers = 4096L

  /** Per-stream bound on deflate-block hops (an empty non-final stored
    * block is 5 bytes and an empty fixed-Huffman block ~10 bits, so
    * this caps adversarial block spam cheaply). */
  private val GzipMaxBlocks = 65536L

  /** Per-stream bound on total INFLATED bytes — the deflate-bomb guard
    * a stored-only walker never needed (stored blocks cannot expand;
    * a dynamic-Huffman stream expands up to ~1032x). Past the cap the
    * walk returns null, never an OOM. */
  private val GzipMaxInflate = 1 << 26

  // RFC 1951 §3.2.5 length/distance alphabets: base values + extra-bit
  // widths for length symbols 257..285 and distance symbols 0..29.
  private val LBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  /** §3.2.7 code-length-code transmission order. */
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** Fixed-Huffman literal/length code lengths (§3.2.6): 0-143 → 8,
    * 144-255 → 9, 256-279 → 7, 280-287 → 8; all 30 distance codes 5. */
  private val FixedLitLens: Array[Int] = {
    val a = new Array[Int](288)
    var i = 0
    while (i < 288) {
      a(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    a
  }
  private val FixedDistLens: Array[Int] = Array.fill(30)(5)

  /** Canonical-Huffman decoding table (§3.2.2): per-length code counts
    * plus symbols sorted by (code length, symbol) — the compact
    * first/count bit-serial walk of zlib's public-domain `puff.c`
    * REFERENCE inflater structure (written here from the RFC's
    * canonical-code construction, not copied). Over-subscribed length
    * sets flag `bad`; incomplete sets are legal (§3.2.7 allows a
    * single-distance-code tree) and fail only if the stream uses an
    * unassigned code. */
  private final class Huffman(lengths: Array[Int], n: Int) {
    val count = new Array[Int](16)
    val symbol = new Array[Int](n)
    var bad = false
    locally {
      var i = 0
      while (i < n) { count(lengths(i)) += 1; i += 1 }
      var left = 1
      var len = 1
      while (len <= 15) {
        left <<= 1
        left -= count(len)
        if (left < 0) bad = true
        len += 1
      }
      val offs = new Array[Int](16)
      len = 1
      while (len < 15) { offs(len + 1) = offs(len) + count(len); len += 1 }
      i = 0
      while (i < n) {
        if (lengths(i) != 0) {
          symbol(offs(lengths(i))) = i
          offs(lengths(i)) += 1
        }
        i += 1
      }
    }
  }

  /** One gzip MEMBER's deflate stream, inflated per RFC 1951 — stored
    * (BTYPE 00), fixed-Huffman (01), and dynamic-Huffman (10) blocks,
    * with the LZ77 window being the member's own output buffer (gzip
    * members are independent deflate streams, so back-references never
    * cross a member boundary). Bit-serial LSB-first reader; `ok = false`
    * (never a throw, never a garbage read) on any malformation: BTYPE
    * 11, stored LEN/NLEN complement mismatch, an over-subscribed code,
    * an unassigned code, literal/length symbol > 285, distance symbol
    * > 29, a back-reference past the member start, input overrun, block
    * spam past `maxBlocks`, or output past `maxOut` (the bomb guard). */
  private final class MemberInflater(p: Array[Byte], start: Int,
                                     maxOut: Int, maxBlocks: Long) {
    private val n = p.length
    private var bitPos: Long = start.toLong << 3
    var out: Array[Byte] = new Array[Byte](256)
    var outLen = 0
    var blocks = 0L
    var endPos = -1 // byte position just past the deflate stream
    private var ok = true

    private def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) {
        val bi = (bitPos >> 3).toInt
        if (bi >= n) { ok = false; return 0 }
        v |= ((p(bi) >> (bitPos & 7L).toInt) & 1) << i
        bitPos += 1
        i += 1
      }
      v
    }

    private def put(b: Byte): Unit = {
      if (outLen >= maxOut) { ok = false; return }
      if (outLen == out.length) {
        val g = new Array[Byte](math.min(maxOut, out.length << 1).max(out.length + 1))
        System.arraycopy(out, 0, g, 0, outLen)
        out = g
      }
      out(outLen) = b
      outLen += 1
    }

    private def decode(h: Huffman): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        code |= bits(1)
        if (!ok) return -1
        val c = h.count(len)
        if (code - first < c) return h.symbol(index + (code - first))
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      ok = false
      -1
    }

    private def codes(lit: Huffman, dist: Huffman): Unit = {
      var done = false
      while (ok && !done) {
        val sym = decode(lit)
        if (!ok) return
        if (sym < 256) put(sym.toByte)
        else if (sym == 256) done = true
        else if (sym > 285) ok = false
        else {
          val li = sym - 257
          val length = LBase(li) + bits(LExtra(li))
          val ds = decode(dist)
          if (!ok) return
          if (ds > 29) { ok = false; return }
          val d = DBase(ds) + bits(DExtra(ds))
          if (!ok) return
          if (d > outLen) { ok = false; return }
          var i = 0
          while (i < length && ok) { put(out(outLen - d)); i += 1 }
        }
      }
    }

    private def stored(): Unit = {
      bitPos = (bitPos + 7L) & ~7L
      val len = bits(16)
      val nlen = bits(16)
      if (!ok) return
      if ((len ^ nlen) != 0xffff) { ok = false; return }
      val bp = (bitPos >> 3).toInt
      if (bp + len > n) { ok = false; return }
      var i = 0
      while (i < len && ok) { put(p(bp + i)); i += 1 }
      bitPos += len.toLong << 3
    }

    private def dynamic(): Unit = {
      val hlit = bits(5) + 257
      val hdist = bits(5) + 1
      val hclen = bits(4) + 4
      if (!ok) return
      if (hlit > 286 || hdist > 30) { ok = false; return }
      val clLens = new Array[Int](19)
      var i = 0
      while (i < hclen && ok) { clLens(ClOrder(i)) = bits(3); i += 1 }
      if (!ok) return
      val cl = new Huffman(clLens, 19)
      if (cl.bad) { ok = false; return }
      val lens = new Array[Int](hlit + hdist)
      i = 0
      while (i < hlit + hdist && ok) {
        val sym = decode(cl)
        if (!ok) return
        if (sym < 16) { lens(i) = sym; i += 1 }
        else {
          var rep = 0
          var v = 0
          if (sym == 16) {
            if (i == 0) { ok = false; return }
            v = lens(i - 1)
            rep = 3 + bits(2)
          } else if (sym == 17) rep = 3 + bits(3)
          else rep = 11 + bits(7)
          if (!ok) return
          if (i + rep > hlit + hdist) { ok = false; return }
          var j = 0
          while (j < rep) { lens(i) = v; i += 1; j += 1 }
        }
      }
      if (!ok) return
      if (lens(256) == 0) { ok = false; return } // no end-of-block code
      val lit = new Huffman(lens, hlit)
      val dst = new Huffman(java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist), hdist)
      if (lit.bad || dst.bad) { ok = false; return }
      codes(lit, dst)
    }

    /** Runs the block loop; true iff the member inflated cleanly. */
    def run(): Boolean = {
      var bfinal = false
      val fixedLit = new Huffman(FixedLitLens, 288)
      val fixedDist = new Huffman(FixedDistLens, 30)
      while (ok && !bfinal) {
        bfinal = bits(1) == 1
        val btype = bits(2)
        if (ok) {
          blocks += 1
          if (blocks > maxBlocks) ok = false
          else btype match {
            case 0 => stored()
            case 1 => codes(fixedLit, fixedDist)
            case 2 => dynamic()
            case _ => ok = false
          }
        }
      }
      if (ok) endPos = ((bitPos + 7L) >> 3).toInt
      ok
    }
  }

  /** RFC 1952 gzip MEMBER-stream walk with a REAL RFC 1951 inflater —
    * the on-disk shape of a Common-Crawl `.warc.gz` (one member per
    * record, members concatenated to end-of-stream). Walks, per member:
    * the 10-byte fixed header (magic 1F 8B, CM 8, FLG, MTIME LE32, XFL,
    * OS), the optional FEXTRA (XLEN LE16 + XLEN bytes), FNAME /
    * FCOMMENT (NUL-terminated), FHCRC (2 bytes) fields in the spec's
    * order, then the deflate stream — stored (BTYPE 00), fixed-Huffman
    * (01), AND dynamic-Huffman (10) blocks via [[MemberInflater]], so
    * real Deflater/zlib captures walk, not just the builder's stored
    * blocks — and the CRC32 + ISIZE LE32 trailer, recomputing both over
    * the INFLATED data (`crcOk` certifies the inflater and the builder
    * against each other, not a copied constant).
    *
    * Returns, via `table` (stride 7 per member): [flg, mtime,
    * header_len, deflate_len, n_blocks, isize, crc_ok] — crc_ok = 1 iff
    * BOTH the stored CRC32 and the stored ISIZE match the recomputed
    * values. When `sink` is non-null each member's inflated bytes are
    * appended in stream order, so concatenating every member recovers
    * the uncompressed stream.
    *
    * Null (never a throw, never a garbage-offset read) for: an empty
    * stream, a bad magic / CM, reserved FLG bits (0xE0), any truncated
    * field, an unterminated FNAME/FCOMMENT, any [[MemberInflater]]
    * malformation (BTYPE 11, NLEN mismatch, bad Huffman code sets,
    * out-of-window references, input overrun), or walks past
    * [[GzipMaxMembers]] / [[GzipMaxBlocks]] / [[GzipMaxInflate]]. */
  private def gzipWalk(p: Array[Byte],
                       sink: java.io.ByteArrayOutputStream):
      scala.collection.mutable.ArrayBuffer[Long] = {
    val n = p.length
    if (n == 0) return null
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    var members = 0L
    var blocksTotal = 0L
    var inflatedTotal = 0L
    while (pos < n) {
      members += 1
      if (members > GzipMaxMembers) return null
      if (pos + 10 > n) return null
      if ((p(pos) & 0xff) != 0x1f || (p(pos + 1) & 0xff) != 0x8b ||
        (p(pos + 2) & 0xff) != 8) return null
      val flg = p(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) return null
      val mtime = le32(pos + 4)
      val hstart = pos
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (pos + 2 > n) return null
        val xlen = le16(pos)
        pos += 2 + xlen
        if (pos > n) return null
      }
      if ((flg & 8) != 0) { // FNAME
        while (pos < n && p(pos) != 0) pos += 1
        if (pos >= n) return null
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (pos < n && p(pos) != 0) pos += 1
        if (pos >= n) return null
        pos += 1
      }
      if ((flg & 2) != 0) { // FHCRC
        pos += 2
        if (pos > n) return null
      }
      val headerLen = (pos - hstart).toLong
      val dstart = pos
      val inf = new MemberInflater(p, dstart,
        (GzipMaxInflate - inflatedTotal).toInt, GzipMaxBlocks - blocksTotal)
      if (!inf.run()) return null
      val crc = new java.util.zip.CRC32()
      crc.update(inf.out, 0, inf.outLen)
      if (sink != null) sink.write(inf.out, 0, inf.outLen)
      val isizeCalc = inf.outLen.toLong
      val blocks = inf.blocks
      blocksTotal += inf.blocks
      inflatedTotal += inf.outLen.toLong
      pos = inf.endPos
      if (pos + 8 > n) return null
      val crcStored = le32(pos)
      val isizeStored = le32(pos + 4)
      val crcOk =
        if (crcStored == crc.getValue && isizeStored == (isizeCalc & 0xffffffffL)) 1L
        else 0L
      val deflateLen = (pos - dstart).toLong
      pos += 8
      out += flg.toLong += mtime += headerLen += deflateLen += blocks +=
        isizeCalc += crcOk
    }
    out
  }

  /** Gzip member-stream census: [n_members, n_fname, n_fextra,
    * n_blocks, header_bytes, deflate_bytes, isize_total, mtime_sum,
    * crc_ok] — header_bytes + deflate_bytes + 8·n_members equals stream
    * length on success (the warcStats byte-accounting cross-check).
    * Null per [[gzipWalk]]'s malformation rules. */
  def gzipMemberStats(p: Array[Byte]): GenericArrayData = {
    val t = gzipWalk(p, null)
    if (t == null) return null
    val m = t.length / 7
    var nFname = 0L; var nFextra = 0L; var blocks = 0L
    var headerBytes = 0L; var deflateBytes = 0L; var isize = 0L
    var mtimeSum = 0L; var crcOk = 0L
    var i = 0
    while (i < m) {
      val flg = t(7 * i)
      if ((flg & 8) != 0) nFname += 1
      if ((flg & 4) != 0) nFextra += 1
      mtimeSum += t(7 * i + 1)
      headerBytes += t(7 * i + 2)
      deflateBytes += t(7 * i + 3)
      blocks += t(7 * i + 4)
      isize += t(7 * i + 5)
      crcOk += t(7 * i + 6)
      i += 1
    }
    new GenericArrayData(Array(m.toLong, nFname, nFextra, blocks,
      headerBytes, deflateBytes, isize, mtimeSum, crcOk))
  }

  /** Per-member gzip geometry table — [[gzipWalk]]'s stride-7 tuples
    * (flg, mtime, header_len, deflate_len, n_blocks, isize, crc_ok)
    * flattened into one long array (member i at indices 7i..7i+6).
    * Null, never a partial table, per the walk's malformation rules. */
  def gzipMemberTable(p: Array[Byte]): GenericArrayData = {
    val t = gzipWalk(p, null)
    if (t == null) null else new GenericArrayData(t.toArray)
  }

  /** Full gzip inflate: every member's inflated bytes concatenated in
    * stream order — stored, fixed-Huffman, and dynamic-Huffman deflate
    * per [[gzipWalk]]'s real inflater, so
    * `warcStats(gzipInflate(warc_gz))` is the complete Common-Crawl
    * read path over REAL captures (zlib/Deflater output), not just the
    * builder's stored blocks. Null per the walk's malformation rules. */
  def gzipInflate(p: Array[Byte]): Array[Byte] = {
    val sink = new java.io.ByteArrayOutputStream()
    val t = gzipWalk(p, sink)
    if (t == null) null else sink.toByteArray
  }

  /** Member-count backstop for the tar walk — same role as
    * [[GzipMaxMembers]]: a runaway header chain becomes null, not an
    * unbounded table. */
  private val TarMaxMembers = 65536L

  /** POSIX ustar (tar) header-chain walk — the container WebDataset
    * shards training samples into (one `<key>.<field>` member per
    * sample field, 512-byte headers, bodies NUL-padded to the block
    * size, two zero blocks at end-of-archive). Walks, per member: the
    * 100-byte NUL-terminated name, the 12-byte octal `size` and
    * `mtime` fields (leading spaces tolerated, NUL/space terminated —
    * the historical writer variance), the 8-byte octal `chksum`, the
    * `ustar\0` magic at offset 257, then skips the body and its
    * padding. The header checksum is RECOMPUTED as the unsigned byte
    * sum of the block with the chksum field read as eight spaces (the
    * ustar rule) — `chksum_ok` certifies builder and walker against
    * each other, never nulls on mismatch (the CRC32 discipline).
    *
    * Returns stride-7 tuples per member:
    * [sample_id, ext_code, body_offset, size, mtime, chksum_ok,
    * ustar_ok]. WebDataset addressing: `sample_id` is the numeric
    * basename (name up to the last '.'; −1 when absent, non-numeric,
    * or LONGER THAN 18 DIGITS — the overflow-free Long parse bound, so
    * a 19-digit basename like 10^18's doc_id reads as −1 rather than
    * wrapping; the q_multimodal_tar_members oracle's sample_id =
    * doc_id identity therefore assumes doc_id < 10^18, recorded here
    * beside the existing non-negative-doc_id corpus contract)
    * and `ext_code` classifies the field by extension
    * (1 = txt, 2 = cls, 3 = json, 0 = other) — the (key, field) pair a
    * shard reader groups on.
    *
    * Null (never a throw, never a misaligned read) for: a stream whose
    * length is not a positive multiple of 512, a header without a
    * parseable octal size/mtime/chksum, a body running past
    * end-of-stream, a missing or short (< 2 blocks) zero-block
    * terminator, any non-zero block after the terminator begins, or
    * more than [[TarMaxMembers]] members. */
  private def tarWalk(p: Array[Byte]):
      scala.collection.mutable.ArrayBuffer[Long] = {
    val n = p.length
    if (n == 0 || n % 512 != 0 || n < 1024) return null
    // strict-field octal parse over [from, from+len): leading spaces,
    // >=1 octal digit, then only NUL/space fill to the field end
    def octal(from: Int, len: Int): Long = {
      var i = from
      val end = from + len
      while (i < end && p(i) == ' '.toByte) i += 1
      var v = 0L
      var digits = 0
      while (i < end && p(i) >= '0'.toByte && p(i) <= '7'.toByte) {
        v = v * 8 + (p(i) - '0'.toByte)
        digits += 1
        i += 1
      }
      if (digits == 0) return -1L
      while (i < end) {
        if (p(i) != 0 && p(i) != ' '.toByte) return -1L
        i += 1
      }
      v
    }
    def zeroBlock(at: Int): Boolean = {
      var i = at
      while (i < at + 512) { if (p(i) != 0) return false; i += 1 }
      true
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    var members = 0L
    while (pos < n && !zeroBlock(pos)) {
      members += 1
      if (members > TarMaxMembers) return null
      val size = octal(pos + 124, 12)
      val mtime = octal(pos + 136, 12)
      val chk = octal(pos + 148, 8)
      if (size < 0 || mtime < 0 || chk < 0) return null
      // recompute: unsigned byte sum with the chksum field as spaces
      var sum = 0L
      var i = pos
      while (i < pos + 512) {
        sum += (if (i - pos >= 148 && i - pos < 156) 0x20 else p(i) & 0xff)
        i += 1
      }
      val chksumOk = if (sum == chk) 1L else 0L
      val ustarOk =
        if (p(pos + 257) == 'u'.toByte && p(pos + 258) == 's'.toByte &&
          p(pos + 259) == 't'.toByte && p(pos + 260) == 'a'.toByte &&
          p(pos + 261) == 'r'.toByte && p(pos + 262) == 0) 1L
        else 0L
      // name → (sample_id, ext_code): basename digits and extension
      var nameEnd = pos
      while (nameEnd < pos + 100 && p(nameEnd) != 0) nameEnd += 1
      var lastDot = -1
      i = pos
      while (i < nameEnd) { if (p(i) == '.'.toByte) lastDot = i; i += 1 }
      var sampleId = -1L
      var extCode = 0L
      if (lastDot > pos) {
        var allDigits = lastDot - pos <= 18
        var v = 0L
        i = pos
        while (allDigits && i < lastDot) {
          if (p(i) >= '0'.toByte && p(i) <= '9'.toByte)
            v = v * 10 + (p(i) - '0'.toByte)
          else allDigits = false
          i += 1
        }
        if (allDigits) sampleId = v
        val extLen = nameEnd - lastDot - 1
        def extIs(s: String): Boolean =
          extLen == s.length && (0 until extLen).forall(k =>
            p(lastDot + 1 + k) == s.charAt(k).toByte)
        extCode =
          if (extIs("txt")) 1L else if (extIs("cls")) 2L
          else if (extIs("json")) 3L else 0L
      }
      val bodyOffset = (pos + 512).toLong
      val padded = ((size + 511L) / 512L) * 512L
      if (bodyOffset + padded > n) return null
      out += sampleId += extCode += bodyOffset += size += mtime +=
        chksumOk += ustarOk
      pos = (bodyOffset + padded).toInt
    }
    // end-of-archive: >=2 all-zero blocks, nothing but zeros after
    if (n - pos < 1024) return null
    while (pos < n) {
      if (!zeroBlock(pos)) return null
      pos += 512
    }
    out
  }

  /** Tar archive census: [n_members, body_bytes, pad_bytes, chksum_ok,
    * ustar_ok, n_txt, n_cls, n_json, n_other, mtime_sum, n_blocks] —
    * n_members·512 + body_bytes + pad_bytes + terminator/padding zeros
    * always equals n_blocks·512 on a well-formed archive (the
    * warcStats byte-accounting cross-check, re-derived analytically by
    * the oracle). Null per [[tarWalk]]'s malformation rules. */
  def tarStats(p: Array[Byte]): GenericArrayData = {
    val t = tarWalk(p)
    if (t == null) return null
    val m = t.length / 7
    var bodyBytes = 0L; var padBytes = 0L; var chksumOk = 0L
    var ustarOk = 0L; var nTxt = 0L; var nCls = 0L; var nJson = 0L
    var nOther = 0L; var mtimeSum = 0L
    var i = 0
    while (i < m) {
      val ext = t(7 * i + 1)
      val size = t(7 * i + 3)
      bodyBytes += size
      padBytes += ((size + 511L) / 512L) * 512L - size
      mtimeSum += t(7 * i + 4)
      chksumOk += t(7 * i + 5)
      ustarOk += t(7 * i + 6)
      if (ext == 1L) nTxt += 1
      else if (ext == 2L) nCls += 1
      else if (ext == 3L) nJson += 1
      else nOther += 1
      i += 1
    }
    new GenericArrayData(Array(m.toLong, bodyBytes, padBytes, chksumOk,
      ustarOk, nTxt, nCls, nJson, nOther, mtimeSum, (p.length / 512).toLong))
  }

  /** Per-member tar geometry table — [[tarWalk]]'s stride-7 tuples
    * (sample_id, ext_code, body_offset, size, mtime, chksum_ok,
    * ustar_ok) flattened into one long array (member i at indices
    * 7i..7i+6). Null, never a partial table, per the walk's
    * malformation rules. */
  def tarMemberTable(p: Array[Byte]): GenericArrayData = {
    val t = tarWalk(p)
    if (t == null) null else new GenericArrayData(t.toArray)
  }

  /** Entry-count backstop for the zip walk. */
  private val ZipMaxEntries = 65536L

  /** ZIP (PKWARE APPNOTE) walk — the other container datasets ship in:
    * sequential local-file-header chain, then the central directory,
    * then the end-of-central-directory record, every layer VERIFIED
    * against the others. Per entry: the 30-byte LFH (sig PK\3\4,
    * version, flags, method, DOS time/date, CRC32, compressed /
    * uncompressed sizes, name), the data — STORED bytes or a real
    * deflate stream via [[MemberInflater]] (so zlib-written zips walk),
    * with CRC32 and both sizes RECOMPUTED (`crc_ok` certifies builder
    * and walker, or the JDK's ZipOutputStream and our inflater, against
    * each other) — and the streaming data descriptor (flag bit 3,
    * `PK\7\8`-signed or bare) the JDK writes after DEFLATED entries.
    * Central-directory entries cross-check name bytes, method, CRC,
    * sizes, and LFH offset per entry (`cd_ok` counts matches); the EOCD
    * must agree on entry count, directory size, and offset.
    *
    * Returns stride-10 tuples per entry: [sample_id, ext_code, method,
    * lfh_offset, data_offset, csize, usize, dtime, crc_ok, cd_ok] —
    * sample_id/ext_code per the tar walk's WebDataset naming rule.
    *
    * Null (never a throw) for: no PK\3\4 at offset 0, a truncated
    * header/data/descriptor, a STORED entry with flag bit 3 (size
    * unknowable mid-stream), any inflater malformation, a compressed
    * size disagreeing with the inflater's consumed span, a missing or
    * count/size/offset-inconsistent EOCD, trailing bytes past the
    * EOCD's declared comment, or more than [[ZipMaxEntries]] entries. */
  private def zipWalk(p: Array[Byte]):
      scala.collection.mutable.ArrayBuffer[Long] = {
    val n = p.length
    if (n < 22) return null
    def le16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def sig(i: Int, c: Int, d: Int): Boolean =
      i + 4 <= n && (p(i) & 0xff) == 0x50 && (p(i + 1) & 0xff) == 0x4b &&
        (p(i + 2) & 0xff) == c && (p(i + 3) & 0xff) == d
    // name → (sample_id, ext_code), the tar walk's WebDataset rule
    def nameKey(from: Int, len: Int): (Long, Long) = {
      var lastDot = -1
      var i = from
      while (i < from + len) { if (p(i) == '.'.toByte) lastDot = i; i += 1 }
      if (lastDot < 0) return (-1L, 0L)
      var sampleId = -1L
      var allDigits = lastDot - from > 0 && lastDot - from <= 18
      var v = 0L
      i = from
      while (allDigits && i < lastDot) {
        if (p(i) >= '0'.toByte && p(i) <= '9'.toByte)
          v = v * 10 + (p(i) - '0'.toByte)
        else allDigits = false
        i += 1
      }
      if (allDigits) sampleId = v
      val extLen = from + len - lastDot - 1
      def extIs(s: String): Boolean =
        extLen == s.length && (0 until extLen).forall(k =>
          p(lastDot + 1 + k) == s.charAt(k).toByte)
      val ext = if (extIs("txt")) 1L else if (extIs("cls")) 2L
        else if (extIs("json")) 3L else 0L
      (sampleId, ext)
    }
    // pass 1: the local chain, with per-entry recompute
    case class Lfh(nameOff: Int, nameLen: Int, method: Int, dtime: Int,
                   crcCalc: Long, csize: Long, usize: Long,
                   offset: Long, dataOff: Long, crcOk: Long)
    val entries = scala.collection.mutable.ArrayBuffer.empty[Lfh]
    var pos = 0
    while (sig(pos, 3, 4)) {
      if (entries.length >= ZipMaxEntries) return null
      if (pos + 30 > n) return null
      val flags = le16(pos + 6)
      val method = le16(pos + 8)
      val dtime = le16(pos + 10)
      val crcHdr = le32(pos + 14)
      val csizeHdr = le32(pos + 18)
      val usizeHdr = le32(pos + 22)
      val nameLen = le16(pos + 26)
      val extraLen = le16(pos + 28)
      val nameOff = pos + 30
      val dstart = nameOff + nameLen + extraLen
      if (dstart > n) return null
      val hasDesc = (flags & 8) != 0
      var csize = csizeHdr; var usize = usizeHdr
      var dataEnd = -1
      val crc = new java.util.zip.CRC32()
      if (method == 0) {
        if (hasDesc) return null // stored size unknowable mid-stream
        if (dstart + csize > n) return null
        crc.update(p, dstart, csize.toInt)
        usize = csize
        dataEnd = dstart + csize.toInt
      } else if (method == 8) {
        val inf = new MemberInflater(p, dstart, GzipMaxInflate,
          GzipMaxBlocks)
        if (!inf.run()) return null
        crc.update(inf.out, 0, inf.outLen)
        val span = (inf.endPos - dstart).toLong
        if (!hasDesc && csizeHdr != span) return null
        csize = span
        usize = inf.outLen.toLong
        dataEnd = inf.endPos
      } else return null
      // streaming descriptor: signed (PK\7\8 + 12) or bare (12)
      var crcRef = crcHdr; var csizeRef = csizeHdr; var usizeRef = usizeHdr
      if (hasDesc) {
        var d = dataEnd
        if (sig(d, 7, 8)) d += 4
        if (d + 12 > n) return null
        crcRef = le32(d); csizeRef = le32(d + 4); usizeRef = le32(d + 8)
        dataEnd = d + 12
      }
      val crcOk =
        if (crcRef == crc.getValue && csizeRef == csize &&
          usizeRef == (usize & 0xffffffffL)) 1L else 0L
      entries += Lfh(nameOff, nameLen, method, dtime, crc.getValue,
        csize, usize, pos.toLong, dstart.toLong, crcOk)
      pos = dataEnd
    }
    // pass 2: the central directory cross-check
    val cdStart = pos
    val cdOk = new Array[Long](entries.length)
    var idx = 0
    while (sig(pos, 1, 2)) {
      if (pos + 46 > n || idx >= entries.length) return null
      val e = entries(idx)
      val method = le16(pos + 10)
      val crcCd = le32(pos + 16)
      val csizeCd = le32(pos + 20)
      val usizeCd = le32(pos + 24)
      val nameLen = le16(pos + 28)
      val extraLen = le16(pos + 30)
      val commentLen = le16(pos + 32)
      val lfhOff = le32(pos + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > n) return null
      val nameEq = nameLen == e.nameLen && (0 until nameLen).forall(k =>
        p(pos + 46 + k) == p(e.nameOff + k))
      cdOk(idx) =
        if (nameEq && method == e.method && crcCd == e.crcCalc &&
          csizeCd == e.csize && usizeCd == (e.usize & 0xffffffffL) &&
          lfhOff == e.offset) 1L
        else 0L
      idx += 1
      pos += 46 + nameLen + extraLen + commentLen
    }
    if (idx != entries.length) return null
    // pass 3: the end record must agree with both walks
    if (!sig(pos, 5, 6) || pos + 22 > n) return null
    val eocdEntries = le16(pos + 10)
    val cdSize = le32(pos + 12)
    val cdOffset = le32(pos + 16)
    val commentLen = le16(pos + 20)
    if (eocdEntries != entries.length || cdSize != (pos - cdStart).toLong ||
      cdOffset != cdStart.toLong || pos + 22 + commentLen != n) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    idx = 0
    while (idx < entries.length) {
      val e = entries(idx)
      val (sampleId, extCode) = nameKey(e.nameOff, e.nameLen)
      out += sampleId += extCode += e.method.toLong += e.offset +=
        e.dataOff += e.csize += e.usize +=
        e.dtime.toLong += e.crcOk += cdOk(idx)
      idx += 1
    }
    out
  }

  /** ZIP census: [n_entries, n_stored, n_deflated, usize_total,
    * csize_total, crc_ok, cd_ok, dtime_sum, n_txt, n_cls, n_json] —
    * crc_ok/cd_ok at n_entries certify data and directory against the
    * walker's recompute. Null per [[zipWalk]]'s malformation rules. */
  def zipStats(p: Array[Byte]): GenericArrayData = {
    val t = zipWalk(p)
    if (t == null) return null
    val m = t.length / 10
    var stored = 0L; var deflated = 0L; var usize = 0L; var csize = 0L
    var crcOk = 0L; var cdOk = 0L; var dtime = 0L
    var nTxt = 0L; var nCls = 0L; var nJson = 0L
    var i = 0
    while (i < m) {
      val ext = t(10 * i + 1)
      if (t(10 * i + 2) == 0L) stored += 1 else deflated += 1
      csize += t(10 * i + 5)
      usize += t(10 * i + 6)
      dtime += t(10 * i + 7)
      crcOk += t(10 * i + 8)
      cdOk += t(10 * i + 9)
      if (ext == 1L) nTxt += 1 else if (ext == 2L) nCls += 1
      else if (ext == 3L) nJson += 1
      i += 1
    }
    new GenericArrayData(Array(m.toLong, stored, deflated, usize, csize,
      crcOk, cdOk, dtime, nTxt, nCls, nJson))
  }

  /** Per-entry zip geometry table — [[zipWalk]]'s stride-10 tuples
    * (sample_id, ext_code, method, lfh_offset, data_offset, csize,
    * usize, dtime, crc_ok, cd_ok) flattened into one long array. Null,
    * never a partial table, per the walk's malformation rules. */
  def zipEntryTable(p: Array[Byte]): GenericArrayData = {
    val t = zipWalk(p)
    if (t == null) null else new GenericArrayData(t.toArray)
  }

  /** The zip walker's builder twin from the OTHER side of the fence:
    * `java.util.zip.ZipOutputStream` writes the archive (one DEFLATED
    * entry at the given level — real dynamic-Huffman data, streaming
    * data descriptor, central directory, EOCD, exactly the layout every
    * JDK/zlib producer emits), so the walker's recomputed CRC32 / size
    * / directory checks certify OUR reader against the reference
    * implementation, not against our own builder. The entry time is
    * pinned to a fixed LocalDateTime (DOS-time encoding is
    * timezone-free through setTimeLocal), so the bytes are
    * deterministic per (name, data, level). */
  def zipReal(name: Array[Byte], data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 128)
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.setLevel(level)
    val e = new java.util.zip.ZipEntry(
      new String(name, java.nio.charset.StandardCharsets.UTF_8))
    e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0))
    zos.putNextEntry(e)
    zos.write(data)
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  /** 64-bit AVERAGE HASH of a BMP's pixel stream — the integer aHash
    * that closes the multimodal family into the dedup family: the
    * pixel sequence (3-byte pixels from offset 54) downsamples to 64
    * cells by the floor mapping cell(i) = ⌊64·i / n⌋, each cell's
    * grayscale is the plain byte sum (b+g+r, no luma weights — no
    * transcendentals anywhere, so a SQL oracle replays every bit), and
    * bit j is the exact cross-multiplied mean test
    * cellSum_j · n > total · cnt_j (empty cells of a sub-64-pixel
    * image read 0 > 0 = unset). Packed MSB-first into 16 lowercase hex
    * chars — a STRING so banding is substring slicing and no sign bit
    * ever overflows an engine's int64. Overflow-safe by construction:
    * cellSum·n ≤ 765·n²/64 stays under 2^63 for any n the JVM's 2 GB
    * array cap admits. Null for non-BMP bytes or an empty pixel
    * stream. Perceptually: equal up to small pixel noise → small
    * hamming distance, the property the banded pair join exploits. */
  /** Grayscale cell sums/counts of a BMP pixel stream under the floor
    * mapping cell(i) = ⌊nCells·i / n⌋ — the shared downsample of the
    * aHash/dHash pair. Null for non-BMP or pixel-less payloads. */
  private def bmpCells(p: Array[Byte], nCells: Int): (Array[Long], Array[Long]) = {
    if (p.length < 57 || p(0) != 'B' || p(1) != 'M') return null
    val n = (p.length - 54) / 3
    if (n == 0) return null
    val sums = new Array[Long](nCells)
    val cnts = new Array[Long](nCells)
    var i = 0
    while (i < n) {
      val off = 54 + 3 * i
      val gray = (p(off) & 0xff) + (p(off + 1) & 0xff) + (p(off + 2) & 0xff)
      val cell = ((nCells.toLong * i) / n).toInt
      sums(cell) += gray
      cnts(cell) += 1
      i += 1
    }
    (sums, cnts)
  }

  /** 64 bits → 16 lowercase hex chars, MSB-first nibbles. */
  private def hashHex(bit: Int => Boolean): org.apache.spark.unsafe.types.UTF8String = {
    val hex = new Array[Byte](16)
    var k = 0
    while (k < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        v = (v << 1) | (if (bit(4 * k + b)) 1 else 0)
        b += 1
      }
      hex(k) = (if (v < 10) '0' + v else 'a' + v - 10).toByte
      k += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(hex)
  }

  def bmpAHash(p: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val cells = bmpCells(p, 64)
    if (cells == null) return null
    val (sums, cnts) = cells
    val n = (p.length - 54) / 3
    var total = 0L
    var j = 0
    while (j < 64) { total += sums(j); j += 1 }
    hashHex(c => sums(c) * n > total * cnts(c))
  }

  /** 64-bit DIFFERENCE HASH — the GRADIENT twin of [[bmpAHash]]: 65
    * cells under the same floor mapping, bit j = the exact
    * cross-multiplied comparison mean(cell j) > mean(cell j+1)
    * (sums(j)·cnts(j+1) > sums(j+1)·cnts(j) — empty cells read
    * 0 > 0 = unset). aHash thresholds against the GLOBAL mean, so a
    * smooth brightness ramp (vignette, exposure gradient) flips every
    * cell that crosses it; dHash compares ADJACENT cells, so local
    * ordering — and therefore the hash — survives exactly the edits
    * aHash cannot (and vice versa: dHash is blind to global-level
    * changes aHash sees). The pair is the standard perceptual-dup
    * toolkit; both are banding-ready hex. Same overflow bound as the
    * aHash (765·n²/65 < 2^63 for any JVM-representable stream). */
  def bmpDHash(p: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val cells = bmpCells(p, 65)
    if (cells == null) return null
    val (sums, cnts) = cells
    hashHex(c => sums(c) * cnts(c + 1) > sums(c + 1) * cnts(c))
  }

  /** (|sample| sums, counts) over `nCells` floor-mapped TIME bands of
    * the 16-bit LE PCM stream at offset 44 of a canonical WAV
    * (RIFF/WAVE magic checked); a trailing odd byte is not a sample.
    * Null for non-WAV or sample-less payloads. */
  private def wavBands(p: Array[Byte], nCells: Int): (Array[Long], Array[Long]) = {
    if (p.length < 46 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
      p(11) != 'E') return null
    val n = (p.length - 44) / 2
    if (n == 0) return null
    val sums = new Array[Long](nCells)
    val cnts = new Array[Long](nCells)
    var i = 0
    while (i < n) {
      val off = 44 + 2 * i
      val s = (p(off + 1) << 8) | (p(off) & 0xff) // signed high byte
      sums(((nCells.toLong * i) / n).toInt) += (if (s < 0) -s else s)
      cnts(((nCells.toLong * i) / n).toInt) += 1
      i += 1
    }
    (sums, cnts)
  }

  /** 64-bit DIFFERENCE HASH of a WAV's PCM stream — the audio member of
    * the perceptual-hash family (the BMP dHash's temporal twin): 65
    * floor-mapped time bands of mean |amplitude|, bit c the exact
    * cross-multiplied adjacent comparison
    * sum_c · cnt_{c+1} > sum_{c+1} · cnt_c — the loudness-envelope
    * GRADIENT, invariant to uniform gain the way the image dHash is
    * invariant to brightness. Overflow-exact for every representable
    * payload: |s| ≤ 32768, bands hold ≤ ⌈n/65⌉+1 samples, and the JVM's
    * ~2.1 GB array cap bounds n ≤ 1.07e9, so each cross product is
    * ≤ 32768·(1.66e7)² ≈ 9.0e18 < 2^63. Same 16-hex-char packing, so
    * the simhash pigeonhole banding applies unchanged. Null for
    * non-WAV bytes or an empty sample stream. */
  def wavDHash(p: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val bands = wavBands(p, 65)
    if (bands == null) return null
    val (sums, cnts) = bands
    hashHex(c => sums(c) * cnts(c + 1) > sums(c + 1) * cnts(c))
  }

  /** The inflater's builder twin: wrap `data` as ONE RFC 1952 member —
    * fixed 10-byte header (FLG 0, MTIME 0, XFL 0, OS 255 "unknown"),
    * REAL deflate via `java.util.zip.Deflater` (raw/nowrap mode at the
    * given level — level 6 emits dynamic-Huffman blocks for natural
    * text, exactly what real `.warc.gz` captures carry), CRC32 + ISIZE
    * trailer. The walker recomputes both trailer values over what IT
    * inflates, so `crc_ok = n_members` downstream certifies the
    * inflater against zlib's compressor — a built-in correctness
    * certificate needing no byte-level oracle. */
  def gzipDeflate(data: Array[Byte], level: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(data)
      d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
    } finally d.end()
    val crc = new java.util.zip.CRC32()
    crc.update(data, 0, data.length)
    val c = crc.getValue
    val isz = data.length.toLong & 0xffffffffL
    var i = 0
    while (i < 4) { out.write(((c >>> (8 * i)) & 0xff).toInt); i += 1 }
    i = 0
    while (i < 4) { out.write(((isz >>> (8 * i)) & 0xff).toInt); i += 1 }
    out.toByteArray
  }

  // -----------------------------------------------------------------
  // EXIF — the APP1/TIFF IFD metadata half of the JPEG seam (the scan
  // walk above reads the pixels' framing; this reads what the camera
  // WROTE about them, incl. the GPS position that is the multimodal
  // counterpart of text PII). Reference geometry: TIFF 6.0 §2 (IFD
  // layout, left-justified inline values) + EXIF 2.3 (the 0x8769 Exif
  // and 0x8825 GPS pointer tags).
  // -----------------------------------------------------------------

  /** Byte sizes of TIFF field types 1–10 (BYTE ASCII SHORT LONG
    * RATIONAL SBYTE UNDEFINED SSHORT SLONG SRATIONAL); index 0 unused.
    * Unknown types fail the walk — strict, never a guess. */
  private val TiffTypeSize: Array[Int] =
    Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8)

  /** IFDs one stream may chain before the walk refuses (main chain +
    * pointer IFDs combined) — a cycle/fan-out guard, far above any
    * real camera file (IFD0 + IFD1 + Exif + GPS + interop = 5). */
  private val ExifMaxIfds = 8

  /** Find the Exif TIFF block inside a JPEG: hop marker segments from
    * SOI until an APP1 whose payload starts `Exif\0\0`; returns
    * (tiffBase, tiffLen) or null. Stops (no EXIF → null) at SOS/EOI —
    * APP1 must precede the scan per EXIF 2.3 §4.5.4. */
  private def exifTiffSpan(p: Array[Byte]): Array[Int] = {
    val n = p.length
    if (n < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return null
    var pos = 2
    while (pos + 3 < n) {
      if ((p(pos) & 0xff) != 0xff) return null // lost marker alignment
      var m = p(pos + 1) & 0xff
      while (m == 0xff && pos + 2 < n) { pos += 1; m = p(pos + 1) & 0xff } // fill bytes
      if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any Exif APP1
      if (pos + 3 >= n) return null
      val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > n) return null // truncated segment
      if (m == 0xe1 && len >= 8 &&
        p(pos + 4) == 'E'.toByte && p(pos + 5) == 'x'.toByte &&
        p(pos + 6) == 'i'.toByte && p(pos + 7) == 'f'.toByte &&
        p(pos + 8) == 0 && p(pos + 9) == 0)
        return Array(pos + 10, len - 8)
      pos += 2 + len
    }
    null
  }

  /** Walk the TIFF IFD chain and visit every entry.
    * `visit(ifdKind, entryOff, tag, typ, cnt, valueField)` — ifdKind
    * 0 = main chain, 1 = Exif IFD, 2 = GPS IFD; entryOff is the
    * absolute offset of the entry's 12 bytes; valueField is the raw
    * u32 of the value/offset field (caller decodes per type). Returns
    * [endian, n_ifds, n_tags] or null for malformed streams. */
  private def tiffWalk(p: Array[Byte], base: Int, tlen: Int)
                      (visit: (Int, Int, Int, Int, Long, Long) => Boolean)
      : Array[Long] = {
    if (tlen < 8 || base + tlen > p.length) return null
    val be =
      if (p(base) == 'M'.toByte && p(base + 1) == 'M'.toByte) true
      else if (p(base) == 'I'.toByte && p(base + 1) == 'I'.toByte) false
      else return null
    def u16(off: Int): Int = {
      val a = p(base + off) & 0xff; val b = p(base + off + 1) & 0xff
      if (be) (a << 8) | b else (b << 8) | a
    }
    def u32(off: Int): Long = {
      val a = (p(base + off) & 0xff).toLong; val b = (p(base + off + 1) & 0xff).toLong
      val c = (p(base + off + 2) & 0xff).toLong; val d = (p(base + off + 3) & 0xff).toLong
      if (be) (a << 24) | (b << 16) | (c << 8) | d
      else (d << 24) | (c << 16) | (b << 8) | a
    }
    if (u16(2) != 42) return null
    var nIfds = 0L
    var nTags = 0L
    val seen = new scala.collection.mutable.HashSet[Long]
    // (offset, kind) work list: the main next-IFD chain enqueues kind 0,
    // pointer tags enqueue their kind — bounded by ExifMaxIfds
    var queue = List((u32(4), 0))
    while (queue.nonEmpty) {
      val (off, kind) = queue.head
      queue = queue.tail
      if (off < 8 || off + 2 > tlen) return null
      if (!seen.add(off)) return null // pointer cycle
      nIfds += 1
      if (nIfds > ExifMaxIfds) return null
      val cnt = u16(off.toInt)
      val entriesEnd = off + 2 + 12L * cnt
      if (entriesEnd + 4 > tlen) return null
      var i = 0
      while (i < cnt) {
        val eo = (off + 2 + 12L * i).toInt
        val tag = u16(eo)
        val typ = u16(eo + 2)
        val c = u32(eo + 4)
        if (typ < 1 || typ > 10) return null
        val size = TiffTypeSize(typ) * c
        val vf = u32(eo + 8)
        if (size > 4 && (vf < 8 || vf + size > tlen)) return null // dangling offset
        if (!visit(kind, base + eo, tag, typ, c, vf)) return null
        if (kind == 0 && tag == 0x8769 && typ == 4 && c == 1)
          queue = (vf, 1) :: queue
        if (kind == 0 && tag == 0x8825 && typ == 4 && c == 1)
          queue = (vf, 2) :: queue
        nTags += 1
        i += 1
      }
      val next = u32(entriesEnd.toInt)
      if (kind == 0 && next != 0) queue = (next, 0) :: queue
    }
    Array(if (be) 1L else 0L, nIfds, nTags)
  }

  /** `graft_exif_stats(payload)`: the APP1/TIFF IFD census —
    * [endian, n_ifds, n_tags, orientation, width_tag, iso, pixel_x,
    * has_gps, n_gps_tags, gps_lat_num, gps_lon_num]; -1 where a tag is
    * absent. Null (never a throw) for: no SOI, lost marker alignment,
    * no Exif APP1 before SOS/EOI, truncated segment, bad byte-order
    * mark or magic, an IFD/value running past the TIFF block, an
    * unknown field type, a pointer cycle, or > [[ExifMaxIfds]] IFDs. */
  def exifStats(p: Array[Byte]): GenericArrayData = {
    val span = exifTiffSpan(p)
    if (span == null) return null
    val base = span(0); val tlen = span(1)
    val be = p(base) == 'M'.toByte
    def u16v(off: Int): Long = {
      val a = (p(off) & 0xff).toLong; val b = (p(off + 1) & 0xff).toLong
      if (be) (a << 8) | b else (b << 8) | a
    }
    def u32at(off: Int): Long = {
      val a = (p(off) & 0xff).toLong; val b = (p(off + 1) & 0xff).toLong
      val c = (p(off + 2) & 0xff).toLong; val d = (p(off + 3) & 0xff).toLong
      if (be) (a << 24) | (b << 16) | (c << 8) | d
      else (d << 24) | (c << 16) | (b << 8) | a
    }
    var orientation = -1L; var width = -1L; var iso = -1L; var pixx = -1L
    var hasGps = 0L; var nGpsTags = 0L; var latNum = -1L; var lonNum = -1L
    val head = tiffWalk(p, base, tlen) { (kind, eo, tag, typ, cnt, vf) =>
      if (kind == 2) { hasGps = 1L; nGpsTags += 1 }
      (kind, tag) match {
        case (0, 0x0112) if typ == 3 && cnt == 1 => orientation = u16v(eo + 8)
        case (0, 0x0100) if cnt == 1 =>
          width = if (typ == 3) u16v(eo + 8) else vf
        case (1, 0x8827) if typ == 3 && cnt == 1 => iso = u16v(eo + 8)
        case (1, 0xA002) if cnt == 1 =>
          pixx = if (typ == 3) u16v(eo + 8) else vf
        case (2, 0x0002) if typ == 5 && cnt >= 1 =>
          latNum = u32at(base + vf.toInt) // first rational's numerator
        case (2, 0x0004) if typ == 5 && cnt >= 1 =>
          lonNum = u32at(base + vf.toInt)
        case _ => ()
      }
      true
    }
    if (head == null) return null
    new GenericArrayData(Array(head(0), head(1), head(2), orientation,
      width, iso, pixx, hasGps, nGpsTags, latNum, lonNum))
  }

  /** `graft_exif_gps_scrub(payload)`: the payload with every GPS IFD
    * entry's VALUE erased — inline values zeroed in the 4-byte field,
    * out-of-line values zeroed at their data offset — and the
    * structure (tags, types, counts, offsets, every other byte)
    * preserved, so the scrubbed file still walks clean and the census
    * reconciles: identical except the GPS value columns read 0. The
    * text_pii discipline applied to the multimodal seam. Null exactly
    * when [[exifStats]] is null (a file the walk cannot certify cannot
    * be certified scrubbed either). */
  def exifGpsScrub(p: Array[Byte]): Array[Byte] = {
    val span = exifTiffSpan(p)
    if (span == null) return null
    val base = span(0); val tlen = span(1)
    val out = java.util.Arrays.copyOf(p, p.length)
    val head = tiffWalk(p, base, tlen) { (kind, eo, tag, typ, cnt, vf) =>
      if (kind == 2) {
        val size = TiffTypeSize(typ) * cnt
        if (size <= 4) {
          var i = 0
          while (i < 4) { out(eo + 8 + i) = 0; i += 1 }
        } else {
          var i = 0
          while (i < size) { out(base + vf.toInt + i) = 0; i += 1 }
        }
      }
      true
    }
    if (head == null) null else out
  }
}

/** `graft_pcm_stats(payload, offset)`: [rms, zcr] of the 16-bit PCM body
  * at a fixed header offset (44 for the WAV container). */
case class PcmStats(child: Expression, offset: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(offset >= 0, s"offset must be non-negative, got $offset")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pcm_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.pcmStats(input.asInstanceOf[Array[Byte]], offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.pcmStats($c, $offset);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_byte_channel_stats(payload, offset, stride)`: per-channel
  * [means..., stds...] of the interleaved byte body at a fixed header
  * offset (54 + stride 3 for the 24bpp BMP container). */
case class ByteChannelStats(child: Expression, offset: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(offset >= 0, s"offset must be non-negative, got $offset")
  require(stride > 0, s"stride must be positive, got $stride")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_channel_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.byteChannelStats(input.asInstanceOf[Array[Byte]], offset, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.byteChannelStats($c, $offset, $stride);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_byte_channel_stats_at(payload, offsetExpr, stride, tailTrim)`:
  * the DYNAMIC-offset form of [[ByteChannelStats]] — a marker-walked
  * container (JPEG) puts its body at a per-row offset, so the offset is
  * a full child expression rather than a plan-time literal; `stride` and
  * `tailTrim` stay plan-time literals (`tailTrim` bytes at the payload
  * end are excluded — the EOI marker). A null or negative runtime offset
  * yields null, never a crash. */
case class ByteChannelStatsAt(payload: Expression, offset: Expression,
                              stride: Int, tailTrim: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  require(stride > 0, s"stride must be positive, got $stride")
  require(tailTrim >= 0, s"tailTrim must be non-negative, got $tailTrim")

  override def left: Expression = payload
  override def right: Expression = offset
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_channel_stats_at"

  override protected def nullSafeEval(p: Any, off: Any): Any = {
    val bytes = p.asInstanceOf[Array[Byte]]
    DspKernel.byteChannelStatsRange(bytes, off.asInstanceOf[Int], stride,
      bytes.length - tailTrim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, off) => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.byteChannelStatsRange(
       |  $p, $off, $stride, $p.length - $tailTrim);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(payload = newLeft, offset = newRight)
}

/** `graft_jpeg_scan_stats(payload)`:
  * [n_dqt, n_dht, n_scans, scan_bytes_total, scan_min, scan_max] from a
  * full JPEG marker walk (see [[DspKernel.jpegScanStats]]); null for
  * non-JPEG or malformed streams. */
case class JpegScanStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_scan_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.jpegScanStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.jpegScanStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_mp4_box_stats(payload)`:
  * [timescale, duration, n_trak, n_boxes, n_mdat, mdat_bytes_total]
  * from the full ISO-BMFF box walk (see [[DspKernel.mp4BoxStats]]);
  * null for non-BMFF or malformed streams. */
case class Mp4BoxStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_box_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.mp4BoxStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.mp4BoxStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_mp4_mdat_channel_stats(payload, stride)`: per-channel
  * [means..., stds...] over the concatenated mdat payloads located by
  * the ISO-BMFF top-level walk (see
  * [[DspKernel.mp4MdatChannelStats]]); null for non-BMFF/malformed
  * streams or an empty body. */
case class Mp4MdatChannelStats(child: Expression, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(stride > 0, s"stride must be positive, got $stride")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_mdat_channel_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.mp4MdatChannelStats(input.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.mp4MdatChannelStats($c, $stride);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_warc_record_stats(payload)`: record census + byte accounting
  * from the full WARC record walk (see [[DspKernel.warcStats]]); null
  * for non-WARC or malformed streams. */
case class WarcRecordStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_record_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.warcStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.warcStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_warc_record_table(payload)`: per-record
  * (type_code, content_length, payload_offset) triples flattened into
  * one long array (see [[DspKernel.warcRecordTable]]); null for
  * non-WARC or malformed streams. */
case class WarcRecordTable(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_record_table"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.warcRecordTable(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.warcRecordTable($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gzip_member_stats(payload)`: RFC 1952 member-stream census
  * over stored-deflate members (null for non-gzip or malformed
  * streams); see [[DspKernel.gzipMemberStats]]. */
case class GzipMemberStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip_member_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.gzipMemberStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.gzipMemberStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gzip_member_table(payload)`: per-member (flg, mtime,
  * header_len, deflate_len, n_blocks, isize, crc_ok) tuples flattened
  * into one long array (see [[DspKernel.gzipMemberTable]]); null for
  * non-gzip or malformed streams. */
case class GzipMemberTable(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip_member_table"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.gzipMemberTable(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.gzipMemberTable($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gzip_inflate(payload)`: the concatenated inflated bytes of
  * every member — stored, fixed-, and dynamic-Huffman deflate per the
  * real RFC 1951 inflater (see [[DspKernel.gzipInflate]]); null for
  * non-gzip or malformed streams. */
case class GzipInflate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gzip_inflate"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.gzipInflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.gzipInflate($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_zip_stats(payload)`: ZIP archive census with per-entry CRC32
  * and central-directory cross-checks (see [[DspKernel.zipStats]]);
  * null for non-zip or malformed archives. */
case class ZipStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.zipStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.zipStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_zip_entry_table(payload)`: per-entry (sample_id, ext_code,
  * method, lfh_offset, data_offset, csize, usize, dtime, crc_ok,
  * cd_ok) tuples flattened into one long array (see
  * [[DspKernel.zipEntryTable]]); null for non-zip or malformed
  * archives. */
case class ZipEntryTable(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_entry_table"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.zipEntryTable(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.zipEntryTable($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_zip_real(name, data, level)`: a REAL single-entry zip written
  * by `java.util.zip.ZipOutputStream` (DEFLATED, streaming descriptor,
  * pinned entry time) — the reference-implementation twin the walker is
  * certified against (see [[DspKernel.zipReal]]). */
case class ZipReal(name: Expression, data: Expression, level: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  require(level >= 0 && level <= 9,
    s"zip deflate level must be in [0, 9], got $level")

  override def left: Expression = name
  override def right: Expression = data
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = name.nullable || data.nullable
  override def prettyName: String = "graft_zip_real"

  override protected def nullSafeEval(n: Any, d: Any): Any =
    DspKernel.zipReal(n.asInstanceOf[Array[Byte]],
      d.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d) => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.zipReal($n, $d, $level);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(name = newLeft, data = newRight)
}

/** `graft_tar_stats(payload)`: POSIX ustar archive census
  * (see [[DspKernel.tarStats]]); null for non-tar or malformed
  * archives. */
case class TarStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.tarStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.tarStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_tar_member_table(payload)`: per-member (sample_id, ext_code,
  * body_offset, size, mtime, chksum_ok, ustar_ok) tuples flattened
  * into one long array (see [[DspKernel.tarMemberTable]]); null for
  * non-tar or malformed archives. */
case class TarMemberTable(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_member_table"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.tarMemberTable(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.tarMemberTable($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bmp_ahash(payload)`: 64-bit average hash of a BMP pixel
  * stream as 16 lowercase hex chars (see [[DspKernel.bmpAHash]]);
  * null for non-BMP or pixel-less payloads. */
case class BmpAHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_ahash"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.bmpAHash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.bmpAHash($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bmp_dhash(payload)`: 64-bit difference hash of a BMP pixel
  * stream as 16 lowercase hex chars (see [[DspKernel.bmpDHash]]);
  * null for non-BMP or pixel-less payloads. */
case class BmpDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_dhash"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.bmpDHash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.bmpDHash($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_wav_dhash(payload)`: 64-bit temporal difference hash of a
  * WAV's PCM stream as 16 lowercase hex chars (see
  * [[DspKernel.wavDHash]]); null for non-WAV or sample-less payloads. */
case class WavDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_dhash"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.wavDHash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.wavDHash($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gzip_deflate(payload, level)`: the single-member gzip wrap of
  * `payload` compressed with REAL deflate at the given level (see
  * [[DspKernel.gzipDeflate]]) — the builder side of the real-capture
  * read-path certificate. Never null on non-null input. */
case class GzipDeflate(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(level >= 0 && level <= 9,
    s"gzip deflate level must be in [0, 9], got $level")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gzip_deflate"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.gzipDeflate(input.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.gzipDeflate($c, $level);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_png_chunk_stats(payload)`: IHDR fields + chunk census + CRC
  * mismatch count from the full PNG chunk walk (null for non-PNG or
  * malformed streams). */
case class PngChunkStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_chunk_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.pngChunkStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.pngChunkStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_exif_stats(payload)`: the JPEG APP1/TIFF IFD metadata census
  * (endianness, IFD chain size, tag census, orientation/width/ISO/
  * pixel-dimension tag values, GPS presence and first lat/lon
  * numerators); null for streams without a certifiable Exif block. */
case class JpegExifStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_stats"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.exifStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.exifStats($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_exif_gps_scrub(payload)`: the payload with every GPS IFD
  * entry's value bytes zeroed, structure preserved — the multimodal
  * counterpart of the text PII scrub. Null iff the stats walk is. */
case class JpegExifGpsScrub(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_gps_scrub"

  override protected def nullSafeEval(input: Any): Any =
    DspKernel.exifGpsScrub(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.DspKernel$$.MODULE$$.exifGpsScrub($c);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaFunctions {
  /** Codegen'd PNG chunk-walk census. */
  def pngChunkStats(payload: Column): Column =
    Bridge.column(PngChunkStats(Bridge.expression(payload)))

  /** Codegen'd JPEG APP1/TIFF IFD metadata census. */
  def exifStats(payload: Column): Column =
    Bridge.column(JpegExifStats(Bridge.expression(payload)))

  /** Codegen'd GPS-value scrub (structure-preserving). */
  def exifGpsScrub(payload: Column): Column =
    Bridge.column(JpegExifGpsScrub(Bridge.expression(payload)))

  /** Codegen'd [rms, zcr] of a 16-bit LE PCM body. */
  def pcmStats(payload: Column, offset: Int): Column =
    Bridge.column(PcmStats(Bridge.expression(payload), offset))

  /** Codegen'd per-channel [means..., stds...] of an interleaved byte body. */
  def byteChannelStats(payload: Column, offset: Int, stride: Int): Column =
    Bridge.column(ByteChannelStats(Bridge.expression(payload), offset, stride))

  /** Codegen'd per-channel stats at a per-row DYNAMIC offset, excluding
    * `tailTrim` trailing bytes. */
  def byteChannelStatsAt(payload: Column, offset: Column, stride: Int,
                         tailTrim: Int): Column =
    Bridge.column(ByteChannelStatsAt(Bridge.expression(payload),
      Bridge.expression(offset), stride, tailTrim))

  /** Codegen'd full-stream JPEG table/scan statistics. */
  def jpegScanStats(payload: Column): Column =
    Bridge.column(JpegScanStats(Bridge.expression(payload)))

  /** Codegen'd ISO-BMFF (MP4) box-walk census. */
  def mp4BoxStats(payload: Column): Column =
    Bridge.column(Mp4BoxStats(Bridge.expression(payload)))

  /** Codegen'd per-channel stats over the walked mdat body. */
  def mp4MdatChannelStats(payload: Column, stride: Int): Column =
    Bridge.column(Mp4MdatChannelStats(Bridge.expression(payload), stride))

  /** Codegen'd WARC (ISO 28500) record-walk census. */
  def warcRecordStats(payload: Column): Column =
    Bridge.column(WarcRecordStats(Bridge.expression(payload)))

  /** Codegen'd per-record WARC geometry table (flattened triples). */
  def warcRecordTable(payload: Column): Column =
    Bridge.column(WarcRecordTable(Bridge.expression(payload)))

  /** Codegen'd RFC 1952 gzip member-stream census. */
  def gzipMemberStats(payload: Column): Column =
    Bridge.column(GzipMemberStats(Bridge.expression(payload)))

  /** Codegen'd per-member gzip geometry table (flattened 7-tuples). */
  def gzipMemberTable(payload: Column): Column =
    Bridge.column(GzipMemberTable(Bridge.expression(payload)))

  /** Codegen'd full gzip inflate (stored + fixed + dynamic Huffman). */
  def gzipInflate(payload: Column): Column =
    Bridge.column(GzipInflate(Bridge.expression(payload)))

  /** Codegen'd single-member gzip wrap via real deflate (zlib level). */
  def gzipDeflate(payload: Column, level: Int = 6): Column =
    Bridge.column(GzipDeflate(Bridge.expression(payload), level))

  /** Codegen'd ZIP archive census (CRC + central-directory verified). */
  def zipStats(payload: Column): Column =
    Bridge.column(ZipStats(Bridge.expression(payload)))

  /** Codegen'd per-entry zip geometry table (flattened 10-tuples). */
  def zipEntryTable(payload: Column): Column =
    Bridge.column(ZipEntryTable(Bridge.expression(payload)))

  /** Codegen'd reference-implementation zip writer (ZipOutputStream). */
  def zipReal(name: Column, data: Column, level: Int = 6): Column =
    Bridge.column(ZipReal(Bridge.expression(name),
      Bridge.expression(data), level))

  /** Codegen'd POSIX ustar archive census. */
  def tarStats(payload: Column): Column =
    Bridge.column(TarStats(Bridge.expression(payload)))

  /** Codegen'd per-member tar geometry table (flattened 7-tuples). */
  def tarMemberTable(payload: Column): Column =
    Bridge.column(TarMemberTable(Bridge.expression(payload)))

  /** Codegen'd 64-bit BMP average hash (16 hex chars). */
  def bmpAHash(payload: Column): Column =
    Bridge.column(BmpAHash(Bridge.expression(payload)))

  /** Codegen'd 64-bit BMP difference hash (16 hex chars). */
  def bmpDHash(payload: Column): Column =
    Bridge.column(BmpDHash(Bridge.expression(payload)))

  /** Codegen'd 64-bit WAV temporal difference hash (16 hex chars). */
  def wavDHash(payload: Column): Column =
    Bridge.column(WavDHash(Bridge.expression(payload)))
}
