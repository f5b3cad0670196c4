package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the Hilbert-curve sort key.
  *
  * Unlike the Morton/Z-order key (a static bit-shuffle, expressible as a
  * flat shift/mask expression tree — ops/Layout.zorderKey), the Hilbert
  * mapping is a per-level STATE MACHINE: each 2-bit quadrant digit both
  * emits a key digit and rotates/reflects the frame the remaining bits
  * are read in. Chaining that through Column expressions would duplicate
  * the (x, y) state ~3× per level (3^bits blowup), and a higher-order
  * function would drop out of whole-stage codegen — this is exactly the
  * custom-Expression case: the classic xy2d loop compiled into the
  * generated Java, one iteration per bit, exact longs end to end.
  *
  * Algorithm (the standard rotate/reflect walk, e.g. Wikipedia "Hilbert
  * curve", public domain): per level s = 2^(bits−1)..1, take quadrant
  * bits (rx, ry), add s²·((3rx) xor ry) to the key, and for ry=0 reflect
  * (rx=1) then transpose. The reflection uses n−1 so coordinates stay in
  * [0, n) — only bits below the current level are read afterwards, for
  * which n−1−v and s−1−v agree.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits out of (0, 31]: $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  private val mask = (1L << bits) - 1L

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    // a negative input's two's-complement low bits would silently scatter
    // the row across the curve (same loud-failure stance as zorderKey)
    if (x < 0L || y < 0L)
      throw new IllegalArgumentException(
        s"hilbertKey: negative input x=$x y=$y")
    var hx = x & mask
    var hy = y & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((hx & s) != 0L) 1L else 0L
      val ry = if ((hy & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { hx = mask - hx; hy = mask - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |if ($a < 0L || $b < 0L) {
         |  throw new IllegalArgumentException(
         |    "hilbertKey: negative input x=" + $a + " y=" + $b);
         |}
         |long $hx = $a & ${mask}L;
         |long $hy = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($hx & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($hy & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = ${mask}L - $hx; $hy = ${mask}L - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Codegen'd Hilbert-curve key of two non-negative integral columns. */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertKey(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
}
