package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, VectorFunctions}
import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {

  private def hofSimDf = {
    import spark.implicits._
    Seq((Array(1.0, 0.0), Array(1.0, 0.0)),
        (Array(1.0, 0.0), Array(0.0, 1.0)),
        (Array(1.0, 2.0), Array(-3.0, 0.5)),
        (Array(0.0, 0.0), Array(1.0, 1.0)))
      .toDF("a", "b")
  }

  test("SQL function graft_cosine_similarity is callable after install") {
    GraftExtensions.install(spark)
    hofSimDf.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT round(graft_cosine_similarity(a, b), 6) AS s FROM vecs ORDER BY s")
      .collect().map(_.getDouble(0))
    // clamp: negative-cosine pair and zero-vector pair both -> 0
    assert(rows.sameElements(Array(0.0, 0.0, 0.0, 1.0)))
  }

  test("SQL function graft_cosine_distance is 1 - similarity") {
    GraftExtensions.install(spark)
    hofSimDf.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      """SELECT round(graft_cosine_distance(a, b)
               + graft_cosine_similarity(a, b), 6) AS s FROM vecs""")
      .collect().map(_.getDouble(0))
    assert(rows.forall(_ == 1.0))
  }

  test("optimizer rule fuses the HOF cosine pattern into CosineSimilarity") {
    GraftExtensions.install(spark)
    // parquet-backed input so the projection survives to the optimized
    // plan (a local Seq constant-folds into a LocalRelation)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), VectorFunctions.toDoubleArray(col("embedding")).as("v"))
    val df = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(VectorFunctions.cosineSimilarity(col("x.v"), col("y.v")).as("s"))
    val optimized = df.queryExecution.optimizedPlan
    val fused = optimized.expressions.flatMap(_.collect {
      case c: CosineSimilarity => c
    })
    assert(fused.nonEmpty, s"no fused expression in:\n$optimized")
    // and the fused plan computes the identical values as the raw HOFs
    val hofOnly = df.limit(50).collect().map(_.getDouble(0))
    assert(hofOnly.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("window top-k idiom rewrites to the bounded-heap operator when enabled") {
    import org.apache.spark.sql.expressions.Window
    GraftExtensions.install(spark)
    // total order (acctbal desc, custkey tiebreak) so both forms must
    // return the SAME rows, not merely equally valid ties
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    def q = Tables.customer(spark, sf0001)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)

    val before = q.queryExecution.executedPlan.toString
    assert(before.contains("Window") && !before.contains("TopKPerGroup"),
      "flag off must leave the window plan untouched")
    val expected = q.orderBy("c_mktsegment", "rk").collect()

    spark.conf.set(graft.plans.RewriteWindowTopK.FLAG, "true")
    try {
      val after = q.queryExecution.executedPlan.toString
      assert(after.contains("TopKPerGroup"), s"not rewritten:\n$after")
      assert(!after.contains("Window"), "Window node must be gone")
      assert(!after.contains("Sort"), "the heap form needs no sort")
      assert(q.orderBy("c_mktsegment", "rk").collect().sameElements(expected))
    } finally spark.conf.set(graft.plans.RewriteWindowTopK.FLAG, "false")
  }

  test("fused and HOF forms agree on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val data = Seq.fill(200)((Array.fill(16)(rnd.nextGaussian()),
      Array.fill(16)(rnd.nextGaussian()))).toDF("a", "b")
    val both = data.select(
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("hof"),
      graft.functions.ArrayMath.cosineSimilarity(col("a"), col("b")).as("fused"))
    assert(both.filter(col("hof") =!= col("fused")).count() == 0)
  }
}
