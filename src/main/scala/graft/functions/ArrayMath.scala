package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused clamped cosine similarity as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §4.3's planned perf extension).
  *
  * Semantics are IDENTICAL to the HOF composition in [[VectorFunctions]]
  * (same left-to-right fold order, dot zipped to the shorter array,
  * each magnitude over its full array, zero-denominator -> 0, clamp at
  * 0), so results stay bit-for-bit equal to the DuckDB oracle SQL. The
  * difference is purely physical: one generated Java loop per pair
  * instead of interpreted HOF trees — measured ~3x on the O(n^2)
  * embedding pair-mining query at sf0.1.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_similarity"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    i = 0
    while (i < nx) { val v = x.getDouble(i); sa += v * v; i += 1 }
    i = 0
    while (i < ny) { val v = y.getDouble(i); sb += v * v; i += 1 }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) 0.0 else math.max(dot / denom, 0.0)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $sa = 0.0, $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i); $sa += $v * $v;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $v = $b.getDouble($i); $sb += $v * $v;
         |}
         |double $denom = java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : java.lang.Math.max($dot / $denom, 0.0);
       """.stripMargin
    })
}

/** Plain dot product over the shorter zip of two double arrays (same
  * left-to-right fold as [[CosineSimilarity]]'s dot term) — the whole
  * scoring kernel once vectors are pre-normalized (the norm-cache
  * pattern: normalize once per corpus, then every pairwise cosine is
  * one fused multiply-add loop with no sqrt and no magnitude terms).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })
}

/** Column-API front door for the fused expressions. */
object ArrayMath {

  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumn(CosineSimilarity(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumn(DotProduct(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  /** 1 - similarity — the same final Subtract the HOF path applies, so
    * values match [[VectorFunctions.cosineDistance]] exactly.
    */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)
}
