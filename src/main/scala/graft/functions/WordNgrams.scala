package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-generating function (UDTF): word n-grams of a
  * text column — `graft_word_ngrams(text, n)` emits one row per
  * position: (pos, ngram), 1-based, whitespace tokenization.
  *
  * This is the custom-Generator leg of the extensibility surface
  * (SURVEY.md §2.12), next to the scalar Expression
  * ([[CosineSimilarity]]) and the typed Aggregator ([[KmvDistinct]]):
  * it plans through the same `Generate` operator as `explode`, so
  * LATERAL VIEW / table-function syntax, predicate pushdown through
  * the generate, and column pruning of unused output all come from
  * Catalyst for free. An equivalent composition exists
  * (posexplode(slice(...)) HOF chains), but the Generator emits rows
  * directly from one pass over the token array — no intermediate
  * array-of-arrays allocation per row.
  *
  * `CodegenFallback` is deliberate: generators are not fused into
  * whole-stage codegen by Spark anyway (Generate is a codegen
  * boundary); eval-mode costs one virtual call per input row, and the
  * per-row work (split + slide) dominates.
  *
  * `n` must be a foldable positive integer (a literal in the query) —
  * enforced at analysis, not runtime.
  */
case class WordNgrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams expects a string column, got ${child.dataType}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_word_ngrams expects a literal integer n")
    else {
      // a foldable NULL literal (CAST(NULL AS INT)) is IntegerType and
      // foldable but evals to null — report it instead of NPEing on the
      // unbox during analysis
      n.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "graft_word_ngrams expects a non-null literal integer n")
        case v =>
          val k = v.asInstanceOf[Int]
          if (k < 1) TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $k")
          else TypeCheckResult.TypeCheckSuccess
      }
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  @transient private lazy val k: Int = n.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ")
      if (words.length < k) Iterator.empty
      else (0 to words.length - k).iterator.map { i =>
        InternalRow(i + 1,
          UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(child = newChildren(0), n = newChildren(1))
}
