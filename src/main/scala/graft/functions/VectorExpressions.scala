package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The similarity/dedup operators originally computed dot products with
  * `aggregate(zip_with(...))` — semantically right, but higher-order
  * functions evaluate their lambdas interpreted, outside WholeStageCodegen,
  * and the bench showed them dominating pair-join cost. This is the case
  * SURVEY.md §7 reserves for a custom `Expression`: same sequential-sum
  * semantics (bit-identical results, including vs the DuckDB oracle),
  * compiled to a tight primitive loop via doGenCode.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection kernel: bit j of the signature is the sign of
  * the dot product of the vector with the j-th Rademacher (±1) hyperplane.
  * Hyperplanes are derived deterministically from a splitmix64 mix of
  * (bit, dimension) — no RNG state, identical on every executor and every
  * run — and cached per (numBits, dims) so each executor pays the
  * derivation once, not per row. */
object SrpKernel {

  /** One hyperplane table per (numBits, dims) pair. A fixed pipeline uses
    * exactly one entry per executor; the cap guards the pathological case
    * of heterogeneous vector dims in one column (data-dependent keys), in
    * which the table is derived per call instead of cached — correct,
    * just not amortized — rather than growing an unbounded map. */
  private val MaxCachedTables = 64
  private val tables = new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private[graft] def cachedTableCount: Int = tables.size()

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def derive(numBits: Int, dims: Int): Array[Double] = {
    val t = new Array[Double](numBits * dims)
    var j = 0
    while (j < numBits) {
      var k = 0
      while (k < dims) {
        t(j * dims + k) = if ((mix(j.toLong * 1000003L + k) & 1L) == 0L) 1.0 else -1.0
        k += 1
      }
      j += 1
    }
    t
  }

  private def table(numBits: Int, dims: Int): Array[Double] = {
    val key = (numBits.toLong << 32) | dims
    val cached = tables.get(key)
    if (cached != null) cached
    else tables.synchronized {
      // size check and insert under one lock: the lock-free check-then-act
      // form could overshoot the cap by up to the thread count on
      // concurrent first-touch of distinct keys. Insertion is once per
      // (bits, dims) per executor — the lock is never on the hot path.
      val again = tables.get(key)
      if (again != null) again
      else {
        val t = derive(numBits, dims)
        if (tables.size() < MaxCachedTables) tables.put(key, t)
        t // over the cap: per-call derivation, bounded memory
      }
    }
  }

  def signature(v: ArrayData, numBits: Int): Long = {
    val d = v.numElements()
    val t = table(numBits, d)
    var sig = 0L
    var j = 0
    while (j < numBits) {
      var s = 0.0
      var k = 0
      while (k < d) { s += v.getDouble(k) * t(j * d + k); k += 1 }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `graft_srp_sig(vec, numBits)`: the SRP signature as a long (numBits ≤
  * 64, fixed at plan time). The collision probability of two vectors on
  * one bit is 1 - θ/π (θ = their angle), which makes banded signatures an
  * LSH family for cosine similarity. */
case class SrpSignature(child: Expression, numBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  require(numBits > 0 && numBits <= 64, s"numBits must be in [1, 64], got $numBits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_srp_sig"

  override protected def nullSafeEval(input: Any): Any =
    SrpKernel.signature(input.asInstanceOf[ArrayData], numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpKernel$$.MODULE$$.signature($c, $numBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Codegen'd sign-random-projection signature. */
  def srpSignature(v: Column, numBits: Int): Column =
    Bridge.column(SrpSignature(Bridge.expression(v), numBits))
}
