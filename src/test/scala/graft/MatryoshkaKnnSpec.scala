package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, MatryoshkaKnn}
import graft.operators.Evaluation

/** Matryoshka truncated-dimension two-stage search: determinism,
  * recall vs the exact oracle, and the re-rank invariant (final
  * distances are TRUE full-dimension distances, not coarse ones).
  */
class MatryoshkaKnnSpec extends SparkSpec {

  test("deterministic across runs") {
    val a = MatryoshkaKnn.topKBatch(spark, sf0001).collect()
    val b = MatryoshkaKnn.topKBatch(spark, sf0001).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(a.sortBy(key).sameElements(b.sortBy(key)))
  }

  test("recall@10 vs exact (prefix 32 of 64 dims, overfetch 16x)") {
    val mrl = MatryoshkaKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val recall = Evaluation.recall(mrl, exact).head.getDouble(0)
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }

  test("surviving candidates carry exact full-dim distances") {
    // every (qid, vec_id) the two-stage search returns must carry the
    // same distance the exact oracle assigns that pair
    val mrl = MatryoshkaKnn.topKBatch(spark, sf0001)
      .select(col("qid"), col("vec_id"), col("dist").as("mdist"))
    val exact = ExactKnn.topKBatch(spark, sf0001, k = 50)
      .select(col("qid"), col("vec_id"), col("dist").as("edist"))
    val joined = mrl.join(exact, Seq("qid", "vec_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getDouble(2) == r.getDouble(3), s"coarse dist leaked: $r"))
  }

  test("full overfetch degenerates to the exact answer") {
    // with the candidate pool = whole base, stage 2 IS the exact search
    val n = Tables.embeddings(spark, sf0001).count().toInt
    val full = MatryoshkaKnn.topKBatch(spark, sf0001, k = 5,
      coarseDim = 8, overfetch = n)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = ExactKnn.topKBatch(spark, sf0001, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(full.sorted.sameElements(exact.sorted))
  }
}
