package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, PqKnn}
import graft.operators.Evaluation

class PqKnnSpec extends SparkSpec {

  test("pq: every query answered with k ascending exact-ranked rows") {
    val df = PqKnn.topKBatch(spark, sf0001, k = 10).cache()
    val (_, queries, _, _) = ExactKnn.split(spark, sf0001)
    assert(df.select("qid").distinct().count() == queries.count())
    val perQ = df.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) == 10))
    assert(df.filter(col("dist") < 0 || col("dist") > 1).count() == 0)
  }

  test("pq: recall@10 vs exact >= 0.7 after exact re-rank of the overfetch") {
    val pq = PqKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val r = Evaluation.recall(pq, exact).collect()(0).getDouble(0)
    assert(r >= 0.7, s"pq recall@10 = $r")
  }

  test("pq codes: compression is 64x and encoding is deterministic") {
    import spark.implicits._
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val cb = PqKnn.trainCodebooks(base, m = 8, ksub = 16, sampleRows = 200)
    assert(cb.books.length == 8 && cb.books.forall(_.length <= 16))
    val once = PqKnn.encode(base, cb).orderBy("vec_id")
      .as[(Long, Array[Byte])].collect()
    val twice = PqKnn.encode(base, cb).orderBy("vec_id")
      .as[(Long, Array[Byte])].collect()
    assert(once.length == twice.length)
    once.zip(twice).foreach { case ((ida, ca), (idb, cbb)) =>
      assert(ida == idb && java.util.Arrays.equals(ca, cbb))
    }
    assert(once.forall(_._2.length == 8), "8 bytes per 64-dim vector = 64x")
  }

  test("lifecycle: reloaded index answers bit-identically to in-memory") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3))
    val live = PqKnn.topKBatch(spark, sf0001).collect().sortBy(key)
    val reloaded = PqKnn.topKBatchLifecycle(spark, sf0001).collect()
      .sortBy(key)
    assert(live.nonEmpty && live.sameElements(reloaded))
  }
}
