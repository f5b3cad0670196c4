package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
}
