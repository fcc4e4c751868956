package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, HnswKnn}

/** The SQL-facing kNN surface: a `CREATE TEMPORARY VIEW ... USING
  * graft.sources.KnnDataSource` registration plus plain SELECTs must
  * answer exactly like the Scala entry points.
  */
class KnnDataSourceSpec extends SparkSpec {

  test("exact backend via pure SQL equals ExactKnn.topKSingle") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_exact
                  USING graft.sources.KnnDataSource
                  OPTIONS (dir '$sf0001', backend 'exact', k '10', queryIdx '29')""")
    val viaSql = spark.sql(
      "SELECT vec_id, dist FROM knn_sql_exact ORDER BY dist, vec_id").collect()
    val viaApi = ExactKnn.topKSingle(spark, sf0001).collect()
    assert(viaSql.sameElements(viaApi))
  }

  test("hnsw backend via pure SQL equals HnswKnn.topKBatch") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_hnsw
                  USING graft.sources.KnnDataSource
                  OPTIONS (dir '$sf0001', backend 'hnsw', k '10')""")
    val viaSql = spark.sql("SELECT * FROM knn_sql_hnsw").collect().toSet
    val viaApi = HnswKnn.topKBatch(spark, sf0001).collect().toSet
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
    // SQL predicates compose over the view
    val one = spark.sql(
      "SELECT count(DISTINCT qid) FROM knn_sql_hnsw WHERE rk <= 3")
      .head.getLong(0)
    assert(one == ExactKnn.split(spark, sf0001)._2.count())
  }

  test("search backend: a user-supplied vector finds itself at distance 0") {
    import spark.implicits._
    val (id, emb) = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .as[(Long, Array[Double])].orderBy("vec_id").head()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_search
                  USING graft.sources.KnnDataSource
                  OPTIONS (dir '$sf0001', backend 'search', k '3',
                           vector '${emb.mkString(",")}')""")
    val rows = spark.sql("SELECT vec_id, dist FROM knn_sql_search").collect()
    assert(rows.length == 3)
    assert(rows.head.getLong(0) == id && rows.head.getDouble(1) == 0.0,
      s"query vector must be its own nearest neighbor, got ${rows.head}")
  }

  test("quantized backends via pure SQL equal their Scala entry points") {
    for ((backend, api) <- Seq(
        "pq" -> graft.knn.PqKnn.topKBatch(spark, sf0001),
        "sq" -> graft.knn.SqKnn.topKBatch(spark, sf0001),
        "ivfpq" -> graft.knn.IvfPqKnn.topKBatch(spark, sf0001),
        "rp" -> graft.knn.RandomProjection.topKBatch(spark, sf0001),
        "bq" -> graft.knn.BinaryQuantKnn.topKBatch(spark, sf0001),
        "mrl" -> graft.knn.MatryoshkaKnn.topKBatch(spark, sf0001))) {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_$backend
                    USING graft.sources.KnnDataSource
                    OPTIONS (dir '$sf0001', backend '$backend', k '10')""")
      val viaSql = spark.sql(s"SELECT * FROM knn_sql_$backend").collect().toSet
      val viaApi = api.collect().toSet
      assert(viaSql == viaApi, s"$backend: SQL view != Scala API")
      assert(viaSql.nonEmpty, s"$backend returned no rows")
    }
  }

  test("unknown backend and missing dir fail loudly") {
    val e1 = intercept[Exception] {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_bad
                    USING graft.sources.KnnDataSource
                    OPTIONS (dir '$sf0001', backend 'nope')""")
    }
    assert(e1.getMessage.contains("unknown backend"))
    val e2 = intercept[Exception] {
      spark.sql("""CREATE OR REPLACE TEMPORARY VIEW knn_sql_bad2
                   USING graft.sources.KnnDataSource
                   OPTIONS (backend 'exact')""")
    }
    assert(e2.getMessage.contains("dir"))
  }
}
