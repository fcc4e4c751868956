package graft

import org.apache.spark.sql.functions._

import graft.knn.ExactKnn

class ExactKnnSpec extends SparkSpec {

  test("split is a deterministic 95/5 prefix split (dataset.rs:19-23)") {
    val (base, queries, splitAt, n) = ExactKnn.split(spark, sf0001)
    assert(n == 500 && splitAt == 475)
    assert(base.count() == 475 && queries.count() == 25)
    assert(base.agg(max("vec_id")).head().getLong(0) == 474)
    assert(queries.agg(min("vec_id")).head().getLong(0) == 475)
  }

  test("single top-k: 10 ascending rows, distances in [0,1]") {
    val rows = SparkEntry.queries("knn_exact_single")(spark, sf0001).collect()
    assert(rows.length == 10)
    val ds = rows.map(_.getDouble(1))
    assert(ds.sameElements(ds.sorted) && ds.forall(d => d >= 0 && d <= 1))
  }

  test("batch top-k: every query gets exactly k rows; self-query sanity") {
    val got = SparkEntry.queries("knn_exact_batch")(spark, sf0001)
    val perQ = got.groupBy("qid").count().collect()
    assert(perQ.length == 25 && perQ.forall(_.getLong(1) == 10))
  }

  test("a base point queried against the base returns itself first") {
    // exact-kNN self-query property (SURVEY.md §5.2)
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val self = base.filter(col("vec_id") === 7)
      .select(col("emb").as("qvec"))
    val top = base.crossJoin(broadcast(self))
      .select(col("vec_id"), ExactKnn.dist(col("emb"), col("qvec")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(1).head()
    assert(top.getLong(0) == 7 && top.getDouble(1) == 0.0)
  }
}
