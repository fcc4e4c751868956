package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst scalar Expression —
  * the record-linkage companion to the built-in `levenshtein` (which
  * backs the FastSS ed-join in TextOps.fuzzyWordPairs). Jaro-Winkler
  * rewards shared prefixes, the signal that matters for name/token
  * linkage where typos cluster at word tails.
  *
  * Standard definition (Winkler 1990): the Jaro similarity counts
  * characters matching within a window of floor(max(|a|,|b|)/2)-1 and
  * discounts transpositions; the Winkler boost adds
  * `prefix * 0.1 * (1 - jaro)` for a common prefix of up to 4 chars,
  * applied only when jaro > 0.7 (the boost threshold). This matches
  * DuckDB's `jaro_winkler_similarity`, which the declared-query
  * oracle uses (boost threshold and 4-char cap verified empirically
  * against DuckDB 1.0 on both boosted and unboosted pairs).
  *
  * Codegen delegates to one static call ([[JaroWinklerImpl.similarity]])
  * so the expression stays inside whole-stage codegen: no virtual
  * dispatch, no interpreted fallback in the join filter hot path.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string columns, got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity($a, $b);")
}

object JaroWinklerImpl {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && c == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order; the mismatch
    // count is always even, so integer halving is exact
    var mism = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}
