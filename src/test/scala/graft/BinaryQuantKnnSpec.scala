package graft

import org.apache.spark.sql.functions._

import graft.knn.{BinaryQuantKnn, ExactKnn}
import graft.operators.Evaluation

/** 1-bit sign-quantization ANN: code packing, determinism, and recall
  * vs the exact oracle (the reference's quality-gate pattern,
  * main.rs:89-93).
  */
class BinaryQuantKnnSpec extends SparkSpec {

  test("codes pack the sign bits exactly") {
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val joined = BinaryQuantKnn.encode(base).join(base, "vec_id").collect()
    joined.foreach { r =>
      val code = r.getLong(1)
      val v = r.getSeq[Double](2)
      v.zipWithIndex.take(64).foreach { case (x, i) =>
        assert(((code >> i) & 1L) == (if (x > 0.0) 1L else 0L),
          s"bit $i of vec ${r.getLong(0)}")
      }
    }
  }

  test("search is deterministic across runs") {
    val a = BinaryQuantKnn.topKBatch(spark, sf0001).collect()
    val b = BinaryQuantKnn.topKBatch(spark, sf0001).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(3))
    assert(a.sortBy(key).sameElements(b.sortBy(key)))
  }

  test("recall@10 vs exact is high (overfetch 16x on 64-bit codes)") {
    val bq = BinaryQuantKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val recall = Evaluation.recall(bq, exact).head.getDouble(0)
    assert(recall >= 0.7, s"recall $recall below 0.7")
  }

  test("each query returns exactly k ranked candidates") {
    val rows = BinaryQuantKnn.topKBatch(spark, sf0001, k = 5).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length == 5)
      assert(g.map(_.getInt(3)).sorted.sameElements(1 to 5))
    }
  }

  test("no query vector crosses the driver (fully distributed plan)") {
    // the whole batch plans as one DataFrame — no collect/toLocalIterator
    // on the query path; assert by planning without an action and
    // checking the physical plan mentions no LocalTableScan of queries
    val df = BinaryQuantKnn.topKBatch(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), plan.take(500))
  }
}
