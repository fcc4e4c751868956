package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D integer point — the space-filling-curve
  * sibling of [[graft.operators.ScaleTechniques.zorderValue]]. Unlike
  * the Morton interleave, every unit step along the Hilbert curve is a
  * grid-adjacent step (no quadrant jumps), which is why lakehouse
  * clustering on Hilbert order gives tighter per-file envelopes than
  * Z-order on the same data (the `layout_curve_read_amp` row measures
  * exactly that). The transform is the classic bit-descent with
  * quadrant rotation (Hilbert 1891; the loop form is the standard
  * public-domain xy2d) — inherently sequential across bit levels, so
  * unlike the Morton fold it does NOT unroll into a shift/mask Column
  * chain without a ~3^bits expression blow-up. It is therefore a native
  * Catalyst Expression: one virtual-call-free loop in generated code,
  * fused inside whole-stage codegen ((b) on the custom-operator
  * preference ladder).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertImpl.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertImpl.index($a, $b, $bits);")
}

/** Static kernel shared by interpreted eval, generated code, and the
  * spec's exhaustive grid checks. Inputs are masked to `bits` — callers
  * pass coordinates already in [0, 2^bits).
  */
object HilbertImpl {

  /** (x, y) -> distance along the order-`bits` Hilbert curve. */
  def index(x: Long, y: Long, bits: Int): Long = {
    val n = 1L << bits
    var xx = x & (n - 1)
    var yy = y & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve is in canonical orientation
      if (ry == 0L) {
        if (rx == 1L) {
          xx = n - 1 - xx
          yy = n - 1 - yy
        }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse transform, d -> (x, y) — used by HilbertSpec to pin the
    * defining property (consecutive indices are grid neighbors) and
    * the round trip.
    */
  def position(d: Long, bits: Int): (Long, Long) = {
    val n = 1L << bits
    var t = d
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Column-API front door. */
object HilbertCurve {

  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftColumn(HilbertIndex(
      GraftColumn.expression(x.cast("long")),
      GraftColumn.expression(y.cast("long")), bits))
}
