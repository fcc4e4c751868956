package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, IvfKnn}
import graft.operators.Evaluation

class IvfKnnSpec extends SparkSpec {

  test("ivf: every query answered with <= k rows, ascending, rk dense") {
    val df = IvfKnn.topKBatch(spark, sf0001, k = 10).cache()
    val (_, queries, _, _) = ExactKnn.split(spark, sf0001)
    assert(df.select("qid").distinct().count() == queries.count())
    assert(df.filter(col("rk") > 10).count() == 0)
    assert(df.filter(col("dist") < 0 || col("dist") > 1).count() == 0)
  }

  test("ivf: recall@10 vs exact >= 0.8; full probe = exact recall 1.0") {
    val ivf = IvfKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val r = Evaluation.recall(ivf, exact).collect()(0).getDouble(0)
    assert(r >= 0.8, s"ivf recall@10 = $r")
    // probing every centroid degenerates to exact search
    val full = IvfKnn.topKBatch(spark, sf0001, nCentroids = 8, nprobe = 8)
      .select("qid", "vec_id")
    val rf = Evaluation.recall(full, exact).collect()(0).getDouble(0)
    assert(rf == 1.0, s"full-probe recall = $rf")
  }
}
