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

  test("window top-k idiom rewrites to the bounded-heap operator by default " +
      "when the order is total") {
    import org.apache.spark.sql.expressions.Window
    GraftExtensions.install(spark)
    // total order: every output column is either the partition key or
    // ordered on directly (acctbal desc, custkey tiebreak) — ties are
    // value-identical, so heap and sort must return the SAME rows and
    // the rule fires with NO flag set
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    def q = Tables.customer(spark, sf0001)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)

    spark.conf.unset(graft.plans.RewriteWindowTopK.FLAG)
    val auto = q.queryExecution.executedPlan.toString
    assert(auto.contains("TopKPerGroup"), s"not rewritten under auto:\n$auto")
    assert(!auto.contains("Window"), "Window node must be gone")
    assert(!auto.contains("Sort"), "the heap form needs no sort")

    // the window form's rows, computed with the rule disabled
    spark.conf.set(graft.plans.RewriteWindowTopK.FLAG, "false")
    try {
      val plain = q.queryExecution.executedPlan.toString
      assert(plain.contains("Window") && !plain.contains("TopKPerGroup"),
        "FLAG=false must leave the window plan untouched")
      val expected = q.orderBy("c_mktsegment", "rk").collect()
      spark.conf.unset(graft.plans.RewriteWindowTopK.FLAG)
      assert(q.orderBy("c_mktsegment", "rk").collect().sameElements(expected))
    } finally spark.conf.unset(graft.plans.RewriteWindowTopK.FLAG)
  }

  test("non-total window order stays a Window under auto, rewrites under force") {
    import org.apache.spark.sql.expressions.Window
    GraftExtensions.install(spark)
    // c_custkey is in the output but neither ordered on nor a partition
    // key: ties on acctbal could surface different custkeys, so auto
    // must NOT fire
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
    def q = Tables.customer(spark, sf0001)
      .select("c_mktsegment", "c_custkey", "c_acctbal")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)

    spark.conf.unset(graft.plans.RewriteWindowTopK.FLAG)
    val auto = q.queryExecution.executedPlan.toString
    assert(auto.contains("Window") && !auto.contains("TopKPerGroup"),
      s"auto must not rewrite a tie-ambiguous order:\n$auto")

    spark.conf.set(graft.plans.RewriteWindowTopK.FLAG, "true")
    try {
      val forced = q.queryExecution.executedPlan.toString
      assert(forced.contains("TopKPerGroup"), s"force did not rewrite:\n$forced")
    } finally spark.conf.unset(graft.plans.RewriteWindowTopK.FLAG)
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

  test("custom Generator graft_word_ngrams emits sliding n-grams from SQL") {
    import spark.implicits._
    GraftExtensions.install(spark)
    Seq((1L, "a b c d"), (2L, "x"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t").createOrReplaceTempView("ngram_fixture")
    val got = spark.sql(
      """SELECT id, pos, ngram FROM ngram_fixture
         LATERAL VIEW graft_word_ngrams(t, 2) g AS pos, ngram""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    spark.catalog.dropTempView("ngram_fixture")
    // short and null texts generate nothing; positions are 1-based
    assert(got == Set((1L, 1, "a b"), (1L, 2, "b c"), (1L, 3, "c d")))
  }

  test("graft_word_ngrams rejects a NULL literal n with a clean analysis " +
      "error, not an NPE") {
    import spark.implicits._
    GraftExtensions.install(spark)
    Seq((1L, "a b c")).toDF("id", "t").createOrReplaceTempView("ngram_null_n")
    val e = intercept[Exception] {
      spark.sql("""SELECT * FROM ngram_null_n
                   LATERAL VIEW graft_word_ngrams(t, CAST(NULL AS INT)) g
                   AS pos, ngram""").collect()
    }
    spark.catalog.dropTempView("ngram_null_n")
    assert(!e.isInstanceOf[NullPointerException])
    assert(e.getMessage.contains("non-null literal integer"),
      s"expected the type-check message, got: ${e.getMessage}")
  }

  test("graft_word_ngrams agrees with the posexplode composition") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val docs = Tables.documents(spark, sf0001).limit(100)
    docs.createOrReplaceTempView("ngram_docs")
    val gen = spark.sql(
      """SELECT doc_id, pos, ngram FROM ngram_docs
         LATERAL VIEW graft_word_ngrams(text, 3) g AS pos, ngram""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    spark.catalog.dropTempView("ngram_docs")
    val composed = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), greatest(size(col("w")) - 2, lit(0))),
          i => concat_ws(" ", slice(col("w"), i, lit(3))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gen == composed && gen.nonEmpty)
  }

  test("SQL-registered KMV UDAF equals the typed Aggregator call") {
    val viaSql = graft.operators.TextOps.sqlSketchUsers(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val viaDf = graft.operators.TextOps.sketchDistinctUsers(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaSql == viaDf && viaSql.nonEmpty)
    // the SQL path partial-aggregates like any built-in (no full-row
    // shuffle): plan shows a two-phase hash aggregate over the UDAF
    val plan = graft.operators.TextOps.sqlSketchUsers(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv_distinct") ||
      plan.contains("HashAggregate"), plan.take(600))
  }
}
