package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the text-dedup hot path.
  *
  * The dedup operators originally built word shingles with
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i+1, n))))` — semantically right, but
  * higher-order functions evaluate their lambdas interpreted, and
  * profiling showed the shingling pass costing ~10× a plain
  * split-explode at sf0.1. Same pattern as DotProduct: identical
  * semantics, one tight kernel, called from generated code so the
  * projection stays inside WholeStageCodegen.
  */
object ShingleKernel {

  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles. Bit-for-bit the semantics of the HOF
    * chain above (pinned by PropertiesSpec against the expression form):
    *
    *  - split on the single space byte with Java limit -1 semantics: ALL
    *    empty tokens kept, including trailing (0x20 never occurs inside a
    *    UTF-8 multi-byte sequence, so the byte scan is exact);
    *  - shingle i = words[i, min(i+n, len)) joined by one space, for
    *    i ∈ [0, max(len-n, 0)] — short texts yield one truncated shingle;
    *  - distinct keeps first-occurrence order (LinkedHashSet).
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val b = text.getBytes
    var count = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') count += 1; i += 1 }
    val words = new Array[UTF8String](count)
    var start = 0
    var w = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        words(w) = UTF8String.fromBytes(b, start, i - start)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val m = math.max(count - n, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= m) {
      val end = math.min(i + n, count)
      val parts = java.util.Arrays.copyOfRange(words, i, end)
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

/** `graft_shingles(text, n)` as a Catalyst expression; n is fixed at plan
  * time (it parameterizes the operator, it is not data). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, s"shingle width must be positive, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass MinHash signatures of a shingle array.
  *
  * The per-row streaming near-dup path originally computed each of the K
  * row minima as `array_min(transform(sh, x -> xxhash64(i, x)))` — K
  * interpreted lambda passes over the array per row. Same hash family,
  * one kernel: for each shingle, fold all K hashes in a tight loop
  * (K chained seeds precomputed once per row), called from generated
  * code. Hash i of shingle s is EXACTLY Spark's `xxhash64(lit(i), s)` —
  * seed 42 chained through the int then the string, via the same XXH64
  * primitives — so signatures are bit-compatible with the batch
  * bandSigs table built from the exploded-postings aggregate
  * (ExtensionsSpec pins both equalities). */
object MinHashKernel {

  private val Xx42 = 42L

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              numHashes: Int): GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { seeds(i) = XXH64.hashInt(i, Xx42); i += 1 }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes
      i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off, len, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_minhash_sigs(shingles, numHashes)`; numHashes is fixed at plan
  * time. Output: array of the K per-row minima (nulls only for an empty
  * input array, mirroring array_min-over-empty). */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)

  override def prettyName: String = "graft_minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel$$.MODULE$$.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One pass of a trained BPE merge table over an encoded sequence.
  *
  * The ≤64-merge replay unrolls into a fold of Spark `replace` calls —
  * codegen'd and fast, but ONE nested expression tree, so janino's
  * 64 KB method limit bounds its depth (past it the whole stage
  * silently drops to interpreted eval — the q_multimodal_png failure
  * mode). A production-depth table (1024+ merges) instead runs as a
  * LOOP over a (pattern, replacement) array held in the kernel: the
  * generated code is one constant-size call regardless of table depth.
  * Each step is UTF8String.replace — the identical leftmost
  * non-overlapping replace-all Spark's `replace` performs — applied in
  * rank order, so loop ≡ unrolled fold bit-for-bit (BpeSpec pins the
  * equality). */
object MergeReplayKernel {
  def compute(seq: UTF8String, pats: Array[UTF8String],
              reps: Array[UTF8String]): UTF8String = {
    var s = seq
    var i = 0
    while (i < pats.length) { s = s.replace(pats(i), reps(i)); i += 1 }
    s
  }
}

/** `graft_bpe_replay(seq)`; the merge table is fixed at plan time (it is
  * the trained artifact, not data). */
case class MergeReplay(child: Expression, patterns: Array[UTF8String],
                       replacements: Array[UTF8String])
    extends UnaryExpression with ExpectsInputTypes {

  require(patterns.length == replacements.length,
    s"merge table mismatch: ${patterns.length} patterns vs ${replacements.length} replacements")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_replay"

  override protected def nullSafeEval(input: Any): Any =
    MergeReplayKernel.compute(input.asInstanceOf[UTF8String], patterns, replacements)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("bpePatterns", patterns,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val reps = ctx.addReferenceObj("bpeReplacements", replacements,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MergeReplayKernel$$.MODULE$$.compute($c, $pats, $reps)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** A trained BPE merge table compiled for the word-wise encoder.
  *
  * The replace-chain replay (MergeReplay over the spaced encoding) scans
  * the WHOLE document string once per merge — ~N×len byte compares for an
  * N-deep table, which at production depth (1024+) measured ~7 µs/byte:
  * fine at sf0.1, a cluster-month at 100 TB. The compiled table instead
  * interns every producible token to an int id (the 26 chars, then each
  * LIVE merge's output) and holds the pair table as one open-addressed
  * long→long map: key = leftId<<32|rightId, value = rank<<32|mergedId.
  * The encoder then prices each word in O(applicable merges × word len)
  * int compares — independent of table depth.
  *
  * Liveness mirrors the string semantics exactly: a merge whose left or
  * right token can never be PRODUCED (not a char, not the output of an
  * earlier live merge) can never fire as a string pattern either, so it
  * gets no pair entry and its output joins no universe. A duplicate
  * (left, right) pair keeps its FIRST rank: the first pass removes every
  * non-overlapping occurrence, and later merges can never re-create the
  * pair (a merged token never equals either of its parts), so the later
  * entry is dead in both models. Merge tokens are required to be
  * `[a-z]+` — the only tokens training over the spaced `[a-z]` encoding
  * can produce; anything else would make the string pattern depend on
  * byte content the token model cannot see, so it is rejected loudly.
  *
  * BpeSpec pins the encoder bit-for-bit against the replace-chain path —
  * golden corpus, the real documents table, and adversarial generated
  * tables (dead merges, duplicates, rank inversions). */
final class BpeTable private (
    val tokenBytes: Array[Array[Byte]],
    val pairKeys: Array[Long],
    val pairVals: Array[Long],
    val mask: Int) extends Serializable {

  /** rank<<32|mergedId for the pair leftId<<32|rightId, or -1 if the pair
    * is not a live merge. */
  def lookup(key: Long): Long = {
    var i = (scala.util.hashing.byteswap64(key) & mask).toInt
    while (true) {
      val k = pairKeys(i)
      if (k == key) return pairVals(i)
      if (k == -1L) return -1L
      i = (i + 1) & mask
    }
    -1L // unreachable: the table keeps ≥ half its slots empty
  }
}

object BpeTable {
  def build(lefts: Seq[String], rights: Seq[String]): BpeTable = {
    require(lefts.length == rights.length,
      s"merge table mismatch: ${lefts.length} lefts vs ${rights.length} rights")
    val toId = new java.util.HashMap[String, Integer]()
    val tokens = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var c = 'a'
    while (c <= 'z') {
      toId.put(c.toString, tokens.length)
      tokens += Array(c.toByte)
      c = (c + 1).toChar
    }
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val seen = new java.util.HashSet[java.lang.Long]()
    var rank = 0
    while (rank < lefts.length) {
      val l = lefts(rank)
      val r = rights(rank)
      require(l.nonEmpty && l.forall(ch => ch >= 'a' && ch <= 'z') &&
        r.nonEmpty && r.forall(ch => ch >= 'a' && ch <= 'z'),
        s"merge tokens must be [a-z]+, got ('$l', '$r') at rank $rank")
      val li = toId.get(l)
      val ri = toId.get(r)
      if (li != null && ri != null) { // both producible → the merge is live
        val key = li.toLong << 32 | ri.toLong
        if (seen.add(key)) { // duplicate pairs: first rank wins, rest are dead
          val merged = l + r
          var mi = toId.get(merged)
          if (mi == null) {
            mi = tokens.length
            toId.put(merged, mi)
            tokens += merged.getBytes("UTF-8")
          }
          entries += key -> (rank.toLong << 32 | mi.toLong)
        }
      }
      rank += 1
    }
    var cap = 4
    while (cap < entries.length * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Long](cap)
    entries.foreach { case (k, v) =>
      var i = (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt
      while (keys(i) != -1L) i = (i + 1) & (cap - 1)
      keys(i) = k
      vals(i) = v
    }
    new BpeTable(tokens.toArray, keys, vals, cap - 1)
  }
}

/** The word-wise BPE encoder: the depth-independent fast twin of the
  * replace-chain replay over the spaced encoding (Bpe.docSeqReplay).
  *
  * Identical word model: split on the single space byte with Java
  * limit -1 semantics (ALL empties kept), an empty word prices as the
  * U+0001 sentinel, a non-`[a-z]+` word passes verbatim as ONE token,
  * and a vocabulary word starts as per-char tokens. Merges then apply in
  * rank order with leftmost non-overlapping sweeps; `minAllowed` renders
  * the order IRREVOCABLE — a sweep that creates a pair of an
  * already-passed rank leaves it unmerged, exactly as the global
  * replace chain would (its pass is over). Both consumers collapse the
  * spaced encoding anyway (count: non-space runs; segments: single-space
  * normalize), so the encoder emits the normalized forms directly. */
object BpeEncodeKernel {

  /** Encode one `[a-z]+` word in place; returns the final token count.
    * `ids` arrives as the per-char token ids. */
  private def encodeWord(ids: Array[Int], len: Int, t: BpeTable): Int = {
    var n = len
    var minAllowed = 0L
    while (n > 1) {
      var bestRank = Long.MaxValue
      var bestA = 0
      var bestB = 0
      var bestM = 0
      var j = 0
      while (j < n - 1) {
        val v = t.lookup(ids(j).toLong << 32 | ids(j + 1).toLong)
        if (v != -1L) {
          val rk = v >>> 32
          if (rk >= minAllowed && rk < bestRank) {
            bestRank = rk
            bestA = ids(j)
            bestB = ids(j + 1)
            bestM = v.toInt
          }
        }
        j += 1
      }
      if (bestRank == Long.MaxValue) return n
      var w = 0
      j = 0
      while (j < n) {
        if (j < n - 1 && ids(j) == bestA && ids(j + 1) == bestB) {
          ids(w) = bestM
          j += 2
        } else {
          ids(w) = ids(j)
          j += 1
        }
        w += 1
      }
      n = w
      minAllowed = bestRank + 1
    }
    n
  }

  private def isVocab(b: Array[Byte], s: Int, e: Int): Boolean = {
    var i = s
    while (i < e) {
      if (b(i) < 'a' || b(i) > 'z') return false
      i += 1
    }
    true
  }

  /** Total BPE token count of the document. */
  def count(text: UTF8String, t: BpeTable): Long = {
    val b = text.getBytes
    var total = 0L
    var ws = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val len = i - ws
        if (len == 0 || !isVocab(b, ws, i)) total += 1L // sentinel or OOV
        else {
          val ids = new Array[Int](len)
          var k = 0
          while (k < len) { ids(k) = b(ws + k) - 'a'; k += 1 }
          total += encodeWord(ids, len, t)
        }
        ws = i + 1
      }
      i += 1
    }
    total
  }

  /** The document's BPE token stream, single-space-joined (word
    * boundaries flatten) — the normalized `segments` form. */
  def join(text: UTF8String, t: BpeTable): UTF8String = {
    val b = text.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length + 16)
    var first = true
    def sep(): Unit = { if (!first) out.write(' '); first = false }
    var ws = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val len = i - ws
        if (len == 0) { sep(); out.write(1) }
        else if (!isVocab(b, ws, i)) { sep(); out.write(b, ws, len) }
        else {
          val ids = new Array[Int](len)
          var k = 0
          while (k < len) { ids(k) = b(ws + k) - 'a'; k += 1 }
          val n = encodeWord(ids, len, t)
          k = 0
          while (k < n) {
            sep()
            val tok = t.tokenBytes(ids(k))
            out.write(tok, 0, tok.length)
            k += 1
          }
        }
        ws = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** `graft_bpe_count(text)`; the merge table is fixed at plan time. */
case class BpeEncodeCount(child: Expression, lefts: Seq[String], rights: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  private val table = BpeTable.build(lefts, rights)

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeKernel.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeKernel$$.MODULE$$.count($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bpe_join(text)`: the single-space-joined token stream. */
case class BpeEncodeJoin(child: Expression, lefts: Seq[String], rights: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  private val table = BpeTable.build(lefts, rights)

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_join"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeKernel.join(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeKernel$$.MODULE$$.join($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass HTML→text walker — the step between a WARC response
  * payload and every text operator downstream (tag strip, script/style/
  * comment elision, entity decode, boilerplate signals: the jusText/C4
  * shape). One pass over the UTF-8 bytes, no allocation beyond the
  * output buffer; all counts are CODEPOINTS (continuation bytes skipped)
  * so they compare against `length()` on both engines.
  *
  * Rules (each chosen to be total — any byte string terminates in one
  * pass, garbage included):
  *  - `<!--` … `-->` comments are elided (content counted to n_elided).
  *  - `<` followed by a letter, `/`, `!` or `?` opens a tag token,
  *    consumed through the next `>`; every tag token counts to n_tags
  *    (DOCTYPE included; comments excluded). A bare `<` followed by
  *    anything else is literal text (the lenient-HTML rule).
  *  - `<script …>` / `<style …>` (ASCII case-insensitive, unless
  *    self-closing `…/>`) elide their content through the matching
  *    `</script` / `</style`, whose close tag then counts to n_tags.
  *  - `<a …>` … `</a>` tracks anchor depth; text codepoints inside any
  *    anchor count to n_anchor_chars (link density's numerator).
  *  - the five core entities `&amp; &lt; &gt; &quot; &apos;` decode
  *    (each counts to n_entities, one decoded text char); any other
  *    `&…` is literal text.
  *  - EOF inside a tag, comment, or script/style body sets the
  *    malformed flag; the partial token contributes nothing to text. */
object HtmlKernel {
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private def codepoints(b: Array[Byte], from: Int, until: Int): Long = {
    var n = 0L
    var i = from
    while (i < until) { if ((b(i) & 0xC0) != 0x80) n += 1; i += 1 }
    n
  }

  /** Index of `what` (ASCII, matched case-insensitively) at or after
    * `from`, or -1. */
  private def indexOfAscii(b: Array[Byte], from: Int, what: String): Int = {
    val w = what.length
    var i = from
    while (i + w <= b.length) {
      var k = 0
      while (k < w && lower(b(i + k)) == what.charAt(k).toByte) k += 1
      if (k == w) return i
      i += 1
    }
    -1
  }

  private val Entities: Array[(String, Byte)] = Array(
    ("&amp;", '&'.toByte), ("&lt;", '<'.toByte), ("&gt;", '>'.toByte),
    ("&quot;", '"'.toByte), ("&apos;", '\''.toByte))

  /** The shared walk: returns (textBytes, [n_chars_html, n_chars_text,
    * n_tags, n_anchors, n_anchor_chars, n_entities, n_elided_chars,
    * malformed]). */
  private def walk(html: UTF8String): (Array[Byte], Array[Long]) = {
    val b = html.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n)
    var nText = 0L; var nTags = 0L; var nAnchors = 0L
    var nAnchorChars = 0L; var nEntities = 0L; var nElided = 0L
    var malformed = false
    var anchorDepth = 0
    def textByte(c: Byte): Unit = {
      out.write(c.toInt)
      if ((c & 0xC0) != 0x80) {
        nText += 1
        if (anchorDepth > 0) nAnchorChars += 1
      }
    }
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '<') {
        if (i + 3 < n && b(i + 1) == '!' && b(i + 2) == '-' && b(i + 3) == '-') {
          val j = indexOfAscii(b, i + 4, "-->")
          if (j < 0) { malformed = true; nElided += codepoints(b, i + 4, n); i = n }
          else { nElided += codepoints(b, i + 4, j); i = j + 3 }
        } else if (i + 1 < n &&
            (isAlpha(b(i + 1)) || b(i + 1) == '/' || b(i + 1) == '!' || b(i + 1) == '?')) {
          val j = indexOfAscii(b, i + 1, ">")
          if (j < 0) { malformed = true; i = n }
          else {
            var k = i + 1
            val closing = b(k) == '/'
            if (closing) k += 1
            val ns = k
            while (k < j && isAlpha(b(k))) k += 1
            val nameLen = k - ns
            def nameIs(s: String): Boolean = {
              if (nameLen != s.length) return false
              var t = 0
              while (t < nameLen) {
                if (lower(b(ns + t)) != s.charAt(t).toByte) return false
                t += 1
              }
              true
            }
            nTags += 1
            val selfClosing = j > i + 1 && b(j - 1) == '/'
            if (nameIs("a")) {
              if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
              else if (!selfClosing) { anchorDepth += 1; nAnchors += 1 }
            }
            if (!closing && !selfClosing && (nameIs("script") || nameIs("style"))) {
              val close = if (nameIs("script")) "</script" else "</style"
              val m = indexOfAscii(b, j + 1, close)
              if (m < 0) { malformed = true; nElided += codepoints(b, j + 1, n); i = n }
              else {
                nElided += codepoints(b, j + 1, m)
                val g = indexOfAscii(b, m, ">")
                if (g < 0) { malformed = true; i = n }
                else { nTags += 1; i = g + 1 }
              }
            } else i = j + 1
          }
        } else { textByte(c); i += 1 }
      } else if (c == '&') {
        var matched = -1
        var e = 0
        while (matched < 0 && e < Entities.length) {
          val (pat, _) = Entities(e)
          val w = pat.length
          if (i + w <= n) {
            var t = 0
            while (t < w && b(i + t) == pat.charAt(t).toByte) t += 1
            if (t == w) matched = e
          }
          e += 1
        }
        if (matched >= 0) {
          textByte(Entities(matched)._2)
          nEntities += 1
          i += Entities(matched)._1.length
        } else { textByte(c); i += 1 }
      } else { textByte(c); i += 1 }
    }
    (out.toByteArray, Array(codepoints(b, 0, n), nText, nTags, nAnchors,
      nAnchorChars, nEntities, nElided, if (malformed) 1L else 0L))
  }

  def text(html: UTF8String): UTF8String =
    UTF8String.fromBytes(walk(html)._1)

  def stats(html: UTF8String): GenericArrayData =
    new GenericArrayData(walk(html)._2)
}

/** Strict UTF-8 validation, census, and repair over RAW bytes — the
  * decode gate a web-scale text pipeline runs between container payloads
  * (WARC/tar slices are bytes, not strings) and every string operator
  * downstream. Validity per RFC 3629 / Unicode Table 3-7: ASCII,
  * C2–DF lead + one continuation, E0/ED with their narrowed second-byte
  * ranges (no overlongs, no surrogates), F0/F4 with theirs (no overlongs,
  * nothing past U+10FFFF). Ill-formed input substitutes ONE U+FFFD per
  * MAXIMAL SUBPART (Unicode §3.9: the longest initial subsequence that is
  * a prefix of some well-formed sequence, else one byte) — the policy the
  * JDK decoder implements, so `new String(bytes, UTF_8)` is the
  * independent model the property spec pins against. */
object Utf8Kernel {

  /** The U+FFFD replacement character's UTF-8 encoding. */
  private val Fffd = Array[Byte](0xEF.toByte, 0xBF.toByte, 0xBD.toByte)

  /** One walk serving both faces: counts always; repaired bytes only
    * when `sink` is non-null. Returns
    * [n_bytes, n_cp_out, n_ascii, n_2byte, n_3byte, n_4byte, n_bad]. */
  private def walk(p: Array[Byte],
                   sink: java.io.ByteArrayOutputStream): Array[Long] = {
    val n = p.length
    var ascii = 0L; var n2 = 0L; var n3 = 0L; var n4 = 0L; var bad = 0L
    var i = 0
    while (i < n) {
      val b0 = p(i) & 0xff
      if (b0 < 0x80) {
        ascii += 1
        if (sink != null) sink.write(b0)
        i += 1
      } else {
        // (length, second-byte range) per lead; -1 marks an invalid lead
        var len = -1; var lo = 0x80; var hi = 0xBF
        if (b0 >= 0xC2 && b0 <= 0xDF) len = 2
        else if (b0 == 0xE0) { len = 3; lo = 0xA0 }
        else if (b0 == 0xED) { len = 3; hi = 0x9F }
        else if (b0 >= 0xE1 && b0 <= 0xEF) len = 3
        else if (b0 == 0xF0) { len = 4; lo = 0x90 }
        else if (b0 == 0xF4) { len = 4; hi = 0x8F }
        else if (b0 >= 0xF1 && b0 <= 0xF3) len = 4
        if (len < 0) { // invalid lead: the one-byte maximal subpart
          bad += 1
          if (sink != null) sink.write(Fffd)
          i += 1
        } else {
          // consume the longest valid prefix; stop at first offender.
          // One deliberate JDK-exact deviation from strict Unicode §3.9:
          // a CESU surrogate ED A0..BF [80..BF] decodes structurally and
          // only then fails Character.isSurrogate in sun.nio.cs.UTF_8,
          // which substitutes the WHOLE unit (malformedForLength(3); 2
          // when the tail byte is absent or not a continuation) — where
          // the strict maximal-subpart rule would emit one U+FFFD per
          // byte. Matching the JDK keeps `new String(bytes, UTF_8)` a
          // carve-out-free independent model over EVERY input.
          var consumed = 1
          var okPrefix = true
          if (i + 1 < n) {
            val b1 = p(i + 1) & 0xff
            if (b1 >= lo && b1 <= hi) consumed = 2
            else {
              okPrefix = false
              if (b0 == 0xED && b1 >= 0xA0 && b1 <= 0xBF) {
                consumed = 2
                if (i + 2 < n && (p(i + 2) & 0xC0) == 0x80) consumed = 3
              }
            }
          }
          var k = 2
          while (okPrefix && consumed == k && k < len && i + k < n) {
            val bk = p(i + k) & 0xff
            if (bk >= 0x80 && bk <= 0xBF) { consumed = k + 1; k += 1 }
            else okPrefix = false
          }
          if (okPrefix && consumed == len) { // well-formed sequence
            if (len == 2) n2 += 1 else if (len == 3) n3 += 1 else n4 += 1
            if (sink != null) sink.write(p, i, len)
            i += len
          } else { // truncated or broken: FFFD for the consumed prefix
            bad += 1
            if (sink != null) sink.write(Fffd)
            i += consumed
          }
        }
      }
    }
    Array(n.toLong, ascii + n2 + n3 + n4 + bad, ascii, n2, n3, n4, bad)
  }

  def stats(p: Array[Byte]): GenericArrayData =
    new GenericArrayData(walk(p, null))

  def sanitize(p: Array[Byte]): UTF8String = {
    val sink = new java.io.ByteArrayOutputStream(p.length + 8)
    walk(p, sink)
    UTF8String.fromBytes(sink.toByteArray)
  }
}

/** `graft_utf8_stats(bytes)`: [n_bytes, n_cp_out, n_ascii, n_2byte,
  * n_3byte, n_4byte, n_bad] over raw bytes (see [[Utf8Kernel]]).
  * Total — garbage counts, never throws. */
case class Utf8Stats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_utf8_stats"

  override protected def nullSafeEval(input: Any): Any =
    Utf8Kernel.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Utf8Kernel$$.MODULE$$.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_utf8_sanitize(bytes)`: the repaired STRING — well-formed
  * sequences verbatim, one U+FFFD per maximal ill-formed subpart (the
  * JDK decoder's policy). Total. */
case class Utf8Sanitize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_utf8_sanitize"

  override protected def nullSafeEval(input: Any): Any =
    Utf8Kernel.sanitize(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Utf8Kernel$$.MODULE$$.sanitize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_html_text(html)`: the extracted text (tags stripped,
  * script/style/comment elided, core entities decoded). Total — any
  * string input yields a string, garbage included. */
case class HtmlTextExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlKernel.text(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlKernel$$.MODULE$$.text($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_html_stats(html)`: [n_chars_html, n_chars_text, n_tags,
  * n_anchors, n_anchor_chars, n_entities, n_elided_chars, malformed]
  * from the same walk (codepoint counts). Total. */
case class HtmlMarkupStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_html_stats"

  override protected def nullSafeEval(input: Any): Any =
    HtmlKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlKernel$$.MODULE$$.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass char-bigram TYPE counts — the language-ID gram build.
  *
  * The langid faces originally exploded one row per bigram OCCURRENCE
  * (`transform(sequence(...))` + explode + groupBy) and re-aggregated
  * to type grain; this kernel walks the UTF-8 byte stream ONCE, slices
  * every adjacent code-point pair at byte boundaries (byte-boundary
  * slicing IS code-point slicing on the valid UTF-8 every Spark string
  * carries — fromString encodes through the UTF-8 encoder), and counts
  * types in first-occurrence order (deterministic output; order never
  * reaches results — every consumer aggregates). Strings under 2 code
  * points return an empty array, the `length(text) >= 2` rule. */
object CharBigramKernel {
  private def cpLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1
    else if ((u & 0xE0) == 0xC0) 2
    else if ((u & 0xF0) == 0xE0) 3
    else if ((u & 0xF8) == 0xF0) 4
    else 1 // continuation/invalid byte: advance one, stay total
  }

  def counts(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    // code-point start offsets + one end sentinel
    var starts = new Array[Int](math.min(n + 1, 64))
    var m = 0
    var i = 0
    while (i < n) {
      if (m == starts.length) starts = java.util.Arrays.copyOf(starts, m * 2)
      starts(m) = i; m += 1
      i += cpLen(b(i))
    }
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    if (m == starts.length) starts = java.util.Arrays.copyOf(starts, m + 1)
    starts(m) = n
    val map = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var k = 0
    while (k < m - 1) {
      val g = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, starts(k), starts(k + 2)))
      val c = map.get(g)
      if (c == null) map.put(g, Array(1L)) else c(0) += 1L
      k += 1
    }
    val out = new Array[Any](map.size)
    val it = map.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_bigram_counts(text)`: array of (g, n) structs — each
  * adjacent code-point pair and its occurrence count, one kernel pass
  * (see [[CharBigramKernel]]). */
case class CharBigramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    new org.apache.spark.sql.types.StructType()
      .add("g", StringType, nullable = false)
      .add("n", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "graft_char_bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharBigramKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharBigramKernel$$.MODULE$$.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Codegen'd distinct word n-gram shingles. */
  def shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Codegen'd one-pass MinHash signature array. */
  def minhashSigs(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(shingles), numHashes))

  /** Codegen'd depth-independent BPE merge replay: pattern i replaces to
    * replacement i, in order, each leftmost non-overlapping replace-all. */
  def mergeReplay(seq: Column, patterns: Seq[String], replacements: Seq[String]): Column =
    Bridge.column(MergeReplay(Bridge.expression(seq),
      patterns.map(UTF8String.fromString).toArray,
      replacements.map(UTF8String.fromString).toArray))

  /** Word-wise BPE token count of raw text — depth-independent, spec-pinned
    * bit-equal to counting the merge-replay output. */
  def bpeCount(text: Column, lefts: Seq[String], rights: Seq[String]): Column =
    Bridge.column(BpeEncodeCount(Bridge.expression(text), lefts, rights))

  /** Word-wise BPE token stream of raw text, single-space-joined —
    * spec-pinned bit-equal to the normalized merge-replay output. */
  def bpeJoin(text: Column, lefts: Seq[String], rights: Seq[String]): Column =
    Bridge.column(BpeEncodeJoin(Bridge.expression(text), lefts, rights))

  /** Codegen'd one-pass char-bigram type counts (the langid gram
    * build): array of (g, n) structs. */
  def charBigramCounts(text: Column): Column =
    Bridge.column(CharBigramCounts(Bridge.expression(text)))

  /** Codegen'd UTF-8 byte census (validity classes + repair count). */
  def utf8Stats(bytes: Column): Column =
    Bridge.column(Utf8Stats(Bridge.expression(bytes)))

  /** Codegen'd UTF-8 repair: bytes → string, U+FFFD per maximal subpart. */
  def utf8Sanitize(bytes: Column): Column =
    Bridge.column(Utf8Sanitize(Bridge.expression(bytes)))

  /** Codegen'd single-pass HTML→text extraction. */
  def htmlText(html: Column): Column =
    Bridge.column(HtmlTextExtract(Bridge.expression(html)))

  /** Codegen'd HTML markup census off the same walk. */
  def htmlStats(html: Column): Column =
    Bridge.column(HtmlMarkupStats(Bridge.expression(html)))
}
