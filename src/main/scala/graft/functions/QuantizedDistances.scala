package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native ADC scoring expression for [[graft.knn.IvfPqKnn]]'s
  * join-based probe: the candidate-scoring stage runs as a plain Spark
  * equi-join (code lists x broadcast probe/LUT relations) with the
  * arithmetic inside whole-stage codegen — the per-pair work reads the
  * joined UnsafeRows in place (offset access into the byte codes and
  * the flattened table), with no typed-lambda deserialization of the
  * LUT per pair. ([[graft.knn.PqKnn]]/[[graft.knn.SqKnn]] score inside
  * zipPartitions on plain JVM arrays instead — same values, different
  * physical shape.)
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

/** Column-API front door. */
object QuantizedDistances {

  def pqAdcDistance(codes: Column, lut: Column, ksub: Int): Column =
    GraftColumn(PqAdcDistance(
      GraftColumn.expression(codes), GraftColumn.expression(lut), ksub))
}
