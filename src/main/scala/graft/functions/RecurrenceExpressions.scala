package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Linear-time sequential-recurrence kernels — the codegen'd
  * replacement for the `aggregate(..., (acc, e) -> concat(acc,
  * array(...)))` fold shape, whose per-step full-accumulator copy is
  * O(n²) per key in series length. Each kernel walks the sorted input
  * array ONCE with scalar (or bounded-bin) state and writes each output
  * row exactly once: state in, row out, O(n) end to end. Shared by the
  * EWMA level tracker, the Holt level+trend forecaster
  * (ops/TimeSeries.ewmaServe/holtServe), and the best-fit-decreasing
  * packer (ops/Sampling.bfdFold); all arithmetic is the same exact
  * integer floor-division discipline the quadratic folds used
  * (`Math.floorDiv` = the portable `(x - posmod(x, den)) DIV den`
  * spelling), so outputs are bit-identical and every existing DuckDB
  * oracle replays unchanged. */
object RecurrenceKernel {

  val KindEwma = 0
  val KindHolt = 1
  val KindBfd = 2

  /** Fold `xs` (array of structs of longs, pre-sorted by the caller)
    * under the recurrence `kind`:
    *
    *  - ewma (in: (bucket_us, swq)): s₁ = x₁,
    *    s_t = ⌊(aNum·x_t + (aDen−aNum)·s_{t−1}) / aDen⌋
    *    → (bucket_us, swq, s)
    *  - holt (in: (bucket_us, swq)): l₁ = x₁, b₁ = 0,
    *    l_t = ⌊(aNum·x_t + (aDen−aNum)·(l+b)) / aDen⌋,
    *    b_t = ⌊(bNum·(l_t−l) + (bDen−bNum)·b) / bDen⌋
    *    → (bucket_us, swq, l, b)
    *  - bfd (in: (neg, doc_id, n), budget in `aNum`): place each doc in
    *    the open bin with the greatest load that still fits (first
    *    index wins load ties — the array_position discipline of the HOF
    *    form), else open a new bin → (doc_id, bin, n)
    */
  def fold(xs: ArrayData, kind: Int, aNum: Long, aDen: Long,
           bNum: Long, bDen: Long): GenericArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    kind match {
      case KindEwma =>
        var s = 0L
        var i = 0
        while (i < n) {
          val r = xs.getStruct(i, 2)
          val bucket = r.getLong(0)
          val x = r.getLong(1)
          s = if (i == 0) x else Math.floorDiv(aNum * x + (aDen - aNum) * s, aDen)
          out(i) = new GenericInternalRow(Array[Any](bucket, x, s))
          i += 1
        }
      case KindHolt =>
        var l = 0L
        var b = 0L
        var i = 0
        while (i < n) {
          val r = xs.getStruct(i, 2)
          val bucket = r.getLong(0)
          val x = r.getLong(1)
          if (i == 0) { l = x; b = 0L }
          else {
            val lPrev = l
            l = Math.floorDiv(aNum * x + (aDen - aNum) * (lPrev + b), aDen)
            b = Math.floorDiv(bNum * (l - lPrev) + (bDen - bNum) * b, bDen)
          }
          out(i) = new GenericInternalRow(Array[Any](bucket, x, l, b))
          i += 1
        }
      case KindBfd =>
        val budget = aNum
        var loads = new Array[Long](8)
        var nBins = 0
        var i = 0
        while (i < n) {
          val r = xs.getStruct(i, 3)
          val docId = r.getLong(1)
          val tok = r.getLong(2)
          var best = -1
          var bestLoad = Long.MinValue
          var j = 0
          while (j < nBins) {
            val ld = loads(j)
            if (ld + tok <= budget && ld > bestLoad) { best = j; bestLoad = ld }
            j += 1
          }
          val bin =
            if (best >= 0) { loads(best) += tok; best }
            else {
              if (nBins == loads.length) {
                val g = new Array[Long](loads.length << 1)
                System.arraycopy(loads, 0, g, 0, nBins)
                loads = g
              }
              loads(nBins) = tok
              nBins += 1
              nBins - 1
            }
          out(i) = new GenericInternalRow(Array[Any](docId, bin.toLong, tok))
          i += 1
        }
      case _ =>
        throw new IllegalArgumentException(s"unknown recurrence kind $kind")
    }
    new GenericArrayData(out)
  }
}

/** `graft_seq_recurrence(xs, kind, ...)`: the linear-time sequential
  * fold over a pre-sorted per-key series array (see
  * [[RecurrenceKernel.fold]]). Null in → null out; an empty series
  * folds to an empty array. */
case class SeqRecurrence(child: Expression, kind: Int,
                         aNum: Long, aDen: Long, bNum: Long, bDen: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(kind >= 0 && kind <= 2, s"unknown recurrence kind $kind")

  private def inFields: Seq[StructField] = kind match {
    case RecurrenceKernel.KindBfd => Seq(
      StructField("neg", LongType), StructField("doc_id", LongType),
      StructField("n", LongType))
    case _ => Seq(
      StructField("bucket_us", LongType), StructField("swq", LongType))
  }

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StructType(inFields.toArray)))

  override def dataType: DataType = kind match {
    case RecurrenceKernel.KindEwma => ArrayType(StructType(Array(
      StructField("bucket_us", LongType), StructField("swq", LongType),
      StructField("s", LongType))))
    case RecurrenceKernel.KindHolt => ArrayType(StructType(Array(
      StructField("bucket_us", LongType), StructField("swq", LongType),
      StructField("l", LongType), StructField("b", LongType))))
    case _ => ArrayType(StructType(Array(
      StructField("doc_id", LongType), StructField("bin", LongType),
      StructField("n", LongType))))
  }

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_seq_recurrence"

  override protected def nullSafeEval(input: Any): Any =
    RecurrenceKernel.fold(input.asInstanceOf[ArrayData], kind,
      aNum, aDen, bNum, bDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.RecurrenceKernel$$.MODULE$$.fold(
       |  $c, $kind, ${aNum}L, ${aDen}L, ${bNum}L, ${bDen}L);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RecurrenceFunctions {
  /** Codegen'd EWMA fold: s₁ = x₁, s_t = ⌊(α·x + (1−α)·s)⌋, α = num/den. */
  def ewmaFold(xs: Column, alphaNum: Long, alphaDen: Long): Column =
    Bridge.column(SeqRecurrence(Bridge.expression(xs),
      RecurrenceKernel.KindEwma, alphaNum, alphaDen, 0L, 1L))

  /** Codegen'd Holt fold: level + trend with rational α, β. */
  def holtFold(xs: Column, alphaNum: Long, alphaDen: Long,
               betaNum: Long, betaDen: Long): Column =
    Bridge.column(SeqRecurrence(Bridge.expression(xs),
      RecurrenceKernel.KindHolt, alphaNum, alphaDen, betaNum, betaDen))

  /** Codegen'd best-fit-decreasing placement over (neg, doc_id, n). */
  def bfdFold(xs: Column, budgetTokens: Long): Column =
    Bridge.column(SeqRecurrence(Bridge.expression(xs),
      RecurrenceKernel.KindBfd, budgetTokens, 1L, 0L, 1L))
}
