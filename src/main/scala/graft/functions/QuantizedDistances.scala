package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native scoring expressions for the quantized ANN families ([[graft.knn.PqKnn]],
  * [[graft.knn.SqKnn]], [[graft.knn.IvfPqKnn]]).
  *
  * These exist so the candidate-scoring stage can run as a plain Spark
  * join (code table x broadcast query relation) with the arithmetic
  * inside whole-stage codegen: the per-pair work reads the joined
  * UnsafeRows in place (offset access into the byte codes and the
  * query-side array), with no typed-lambda deserialization of the query
  * payload per pair and no driver-side query collection — queries stay
  * a DataFrame end to end.
  */

/** Asymmetric-distance (ADC) score of a PQ code row against one query's
  * FLATTENED lookup table (`lut[j * ksub + c]` = dot of query subvector
  * j with codebook entry c — row-major [[graft.knn.PqKnn.queryLut]]).
  * Value: `1 - max(Σ_j lut[j*ksub + code_j], 0)` — bit-identical to the
  * typed-loop fold it replaces (same j-ascending order).
  */
case class PqAdcDistance(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_distance"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(c: Any, l: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val lut = l.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      s += lut.getDouble(j * ksub + (codes(j) & 0xff))
      j += 1
    }
    1.0 - math.max(s, 0.0)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $c.length; $j++) {
         |  $s += $l.getDouble($j * $ksub + ($c[$j] & 0xff));
         |}
         |${ev.value} = 1.0 - java.lang.Math.max($s, 0.0);
       """.stripMargin
    })
}

/** Fused decode + clamped cosine distance of an SQ8 code row against a
  * raw query vector: dimension i decodes to
  * `min_i + (code_i & 0xff) / 255 * (max_i - min_i)` and feeds one
  * dot/norms loop — bit-identical to the typed fold it replaces
  * (zip to the shorter length, zero denominator -> 1.0, clamp at 0).
  * The per-dimension bounds ride in the expression itself (plan
  * constants, 2 x dim doubles).
  */
case class SqApproxDistance(left: Expression, right: Expression,
    mins: Array[Double], maxs: Array[Double]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq_approx_distance"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(c: Any, q: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val qv = q.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(codes.length, qv.numElements())
    while (i < n) {
      val span = maxs(i) - mins(i)
      val x = mins(i) + (codes(i) & 0xff) / 255.0 * span
      val y = qv.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0) 1.0 else 1.0 - math.max(dot / denom, 0.0)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val minsRef = ctx.addReferenceObj("sqMins", mins, "double[]")
      val maxsRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val span = ctx.freshName("span")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($c.length, $q.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $span = $maxsRef[$i] - $minsRef[$i];
         |  double $x = $minsRef[$i] + ($c[$i] & 0xff) / 255.0 * $span;
         |  double $y = $q.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0) ? 1.0 : 1.0 - java.lang.Math.max($dot / $denom, 0.0);
       """.stripMargin
    })
}

/** Column-API front door. */
object QuantizedDistances {

  def pqAdcDistance(codes: Column, lut: Column, ksub: Int): Column =
    GraftColumn(PqAdcDistance(
      GraftColumn.expression(codes), GraftColumn.expression(lut), ksub))

  def sqApproxDistance(codes: Column, qvec: Column,
      mins: Array[Double], maxs: Array[Double]): Column =
    GraftColumn(SqApproxDistance(
      GraftColumn.expression(codes), GraftColumn.expression(qvec), mins, maxs))
}
