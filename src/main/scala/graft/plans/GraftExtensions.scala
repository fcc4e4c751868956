package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Session extension installing graft's Catalyst surface:
  *   - `graft_cosine_similarity(a, b)` as a SQL-callable function;
  *   - [[FuseCosineSimilarity]] so HOF-composed cosine plans run fused.
  *
  * Install at session build (`--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * or `builder.withExtensions(new GraftExtensions)`), or on a live
  * session via [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityFunction)
    ext.injectFunction(GraftExtensions.cosineDistanceFunction)
    ext.injectFunction(GraftExtensions.wordNgramsFunction)
    ext.injectFunction(GraftExtensions.jaroWinklerFunction)
    ext.injectOptimizerRule(_ => FuseCosineSimilarity)
    ext.injectOptimizerRule(_ => RewriteWindowTopK) // no-op unless its flag is set
    ext.injectPlannerStrategy(_ => GraftStrategies)
  }
}

object GraftExtensions {

  private def builder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_cosine_similarity expects 2 arguments, got ${args.length}")
    CosineSimilarity(args.head, args(1))
  }

  val cosineSimilarityFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_similarity"),
      builder _)

  /** distance = 1 - similarity, as the same fused expression under a
    * Subtract (identical values to the Column-API cosineDistance).
    */
  private def distBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_cosine_distance expects 2 arguments, got ${args.length}")
    org.apache.spark.sql.catalyst.expressions.Subtract(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      CosineSimilarity(args.head, args(1)))
  }

  val cosineDistanceFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_cosine_distance"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_distance"),
      distBuilder _)

  /** Table-generating function (UDTF): word n-grams via the custom
    * Catalyst Generator [[graft.functions.WordNgrams]].
    */
  private def ngramsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_word_ngrams expects 2 arguments, got ${args.length}")
    graft.functions.WordNgrams(args.head, args(1))
  }

  val wordNgramsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[graft.functions.WordNgrams].getName,
        "graft_word_ngrams"),
      ngramsBuilder _)

  /** Scalar string-similarity expression for record linkage:
    * `graft_jaro_winkler(a, b)` (DuckDB-compatible semantics).
    */
  private def jwBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_jaro_winkler expects 2 arguments, got ${args.length}")
    graft.functions.JaroWinkler(args.head, args(1))
  }

  val jaroWinklerFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
        "graft_jaro_winkler"),
      jwBuilder _)

  /** Install all pieces on an already-running session (tests, shells). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_similarity", builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_distance", distBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_ngrams", ngramsBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", jwBuilder, "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(FuseCosineSimilarity)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosineSimilarity
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    }
    installStrategy(spark)
  }

  /** Just the planner strategy (idempotent) — the piece library
    * operators like GraftOps.topKPerGroup need at minimum.
    */
  def installStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategies)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    }
}
