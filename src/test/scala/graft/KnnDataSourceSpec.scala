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
        "bq256" -> graft.knn.BinaryQuantKnn.topKBatchWide(spark, sf0001),
        "mrl" -> graft.knn.MatryoshkaKnn.topKBatch(spark, sf0001),
        "opq" -> graft.knn.OpqKnn.topKBatch(spark, sf0001),
        "vamana" -> graft.knn.VamanaKnn.topKBatch(spark, sf0001))) {
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_sql_$backend
                    USING graft.sources.KnnDataSource
                    OPTIONS (dir '$sf0001', backend '$backend', k '10')""")
      val viaSql = spark.sql(s"SELECT * FROM knn_sql_$backend").collect().toSet
      val viaApi = api.collect().toSet
      assert(viaSql == viaApi, s"$backend: SQL view != Scala API")
      assert(viaSql.nonEmpty, s"$backend returned no rows")
    }
  }

  test("DSv2: exact_batch view answers identically to DSv1 and the API") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_v2_batch
                  USING graft.sources.KnnDataSourceV2
                  OPTIONS (dir '$sf0001', backend 'exact_batch', k '10')""")
    val viaV2 = spark.sql("SELECT * FROM knn_v2_batch").collect().toSet
    val viaApi = ExactKnn.topKBatch(spark, sf0001).collect().toSet
    assert(viaV2 == viaApi && viaV2.nonEmpty)
  }

  test("DSv2: qid filter is PUSHED into the scan and column pruning " +
      "narrows the read schema") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_v2_push
                  USING graft.sources.KnnDataSourceV2
                  OPTIONS (dir '$sf0001', backend 'exact_batch', k '10')""")
    val q = spark.sql("SELECT vec_id FROM knn_v2_push WHERE qid = 475")
    val plan = q.queryExecution.executedPlan.toString
    // the bridge relation prints its negotiated pushedFilters; the filter
    // must reach the scan, not sit above it over the full batch result
    assert(plan.contains("KnnV1BridgeRelation"), s"V2 scan missing:\n$plan")
    assert(plan.contains("EqualTo(qid,475)"),
      s"qid filter not pushed into the scan:\n$plan")
    // pruned read schema: the scan output carries no dist/rk
    val scanLine = plan.linesIterator.find(_.contains("KnnV1BridgeRelation")).get
    assert(!scanLine.contains("dist"), s"dist survived pruning: $scanLine")
    // and the answer still matches the API
    val expect = ExactKnn.topKBatch(spark, sf0001)
      .filter(col("qid") === 475L).select("vec_id").collect().map(_.getLong(0)).toSet
    val got = q.collect().map(_.getLong(0)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("DSv2: COUNT/MIN/MAX aggregate is pushed into the scan") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_v2_agg
                  USING graft.sources.KnnDataSourceV2
                  OPTIONS (dir '$sf0001', backend 'exact_batch', k '10')""")
    val q = spark.sql("SELECT count(*) FROM knn_v2_agg")
    val plan = q.queryExecution.executedPlan.toString
    // complete pushdown: the scan itself returns the one aggregated
    // row (the bridge relation prints aggPushed) and no hash aggregate
    // runs above it over the full result frame
    assert(plan.contains("aggPushed"),
      s"aggregate not pushed into the scan:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"aggregate still planned above the pushed scan:\n$plan")
    val expect = ExactKnn.topKBatch(spark, sf0001).count()
    assert(q.collect().head.getLong(0) == expect && expect > 0)
    // min/max push completely too
    val mm = spark.sql("SELECT min(qid), max(rk) FROM knn_v2_agg")
    assert(mm.queryExecution.executedPlan.toString.contains("aggPushed"))
    val row = mm.collect().head
    assert(row.getLong(0) == 475L && row.getInt(1) == 10)
    // grouped aggregates are declined and still answer correctly
    val grouped = spark.sql(
      "SELECT qid, count(*) FROM knn_v2_agg GROUP BY qid")
    assert(!grouped.queryExecution.executedPlan.toString.contains("aggPushed"))
    assert(grouped.collect().map(_.getLong(1)).forall(_ == 10L))
  }

  test("DSv2: ORDER BY dist LIMIT k collapses into the scan (TopN pushdown)") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_v2_topn
                  USING graft.sources.KnnDataSourceV2
                  OPTIONS (dir '$sf0001', backend 'exact_batch', k '10')""")
    val q = spark.sql("""SELECT vec_id, dist FROM knn_v2_topn
                         WHERE qid = 475 ORDER BY dist ASC, vec_id ASC
                         LIMIT 5""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("topNPushed"),
      s"top-N not pushed into the scan:\n$plan")
    // complete pushdown: no sort or TakeOrdered planned ABOVE the scan
    val aboveScan = plan.linesIterator
      .takeWhile(!_.contains("KnnV1BridgeRelation")).mkString("\n")
    assert(!aboveScan.contains("Sort") && !aboveScan.contains("TakeOrdered"),
      s"sort/limit still planned above the pushed scan:\n$plan")
    val expect = ExactKnn.topKBatch(spark, sf0001)
      .filter(col("qid") === 475L)
      .orderBy(col("dist").asc, col("vec_id").asc).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got == expect && got.length == 5)
    // bare LIMIT (no ordering) pushes too and returns the right count
    val lim = spark.sql("SELECT vec_id FROM knn_v2_topn LIMIT 7")
    assert(lim.queryExecution.executedPlan.toString.contains("topNPushed"))
    assert(lim.collect().length == 7)
    // an order over an expression is declined and still answers right
    val expr = spark.sql("""SELECT vec_id FROM knn_v2_topn
                            WHERE qid = 475 ORDER BY dist * 2, vec_id LIMIT 3""")
    assert(!expr.queryExecution.executedPlan.toString.contains("topNPushed"))
    assert(expr.collect().map(_.getLong(0)).toSeq == expect.take(3))
  }

  test("DSv2: unsupported filters stay residual and remain correct") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW knn_v2_resid
                  USING graft.sources.KnnDataSourceV2
                  OPTIONS (dir '$sf0001', backend 'exact_batch', k '10')""")
    // endswith on a numeric cast is not in the translated subset -> Spark
    // must evaluate it above the scan; result equality is the contract
    val got = spark.sql("""SELECT qid, vec_id FROM knn_v2_resid
                           WHERE CAST(vec_id AS STRING) LIKE '%7' AND rk <= 2""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = ExactKnn.topKBatch(spark, sf0001)
      .filter(col("vec_id").cast("string").endsWith("7") && col("rk") <= 2)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
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
