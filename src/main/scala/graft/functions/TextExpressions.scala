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

object TextFunctions {
  /** Codegen'd distinct word n-gram shingles. */
  def shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
