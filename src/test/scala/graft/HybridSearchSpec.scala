package graft

import org.apache.spark.sql.functions._

import graft.knn.ExactKnn
import graft.operators.HybridSearch

class HybridSearchSpec extends SparkSpec {

  test("mmr: lambda=1 degenerates to the plain top-k ranking") {
    val mmr = HybridSearch.mmrTopK(spark, sf0001, k = 10, lambda = 1.0)
      .orderBy(col("rank")).collect().map(r => r.getLong(1))
    val plain = ExactKnn.topKSingle(spark, sf0001, k = 10)
      .collect().map(r => r.getLong(0))
    assert(mmr.sameElements(plain))
  }

  test("mmr: k distinct results, first pick is the nearest neighbor") {
    val rows = HybridSearch.mmrTopK(spark, sf0001, k = 10, lambda = 0.7)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10 && rows.map(_._2).distinct.length == 10)
    assert(rows.map(_._1).sameElements(1 to 10))
    val nearest = ExactKnn.topKSingle(spark, sf0001, k = 1).head.getLong(0)
    assert(rows.head._2 == nearest)
    // scores within the selection order may rise or fall, but every
    // result must come from the candidate depth
    val cand = ExactKnn.topKSingle(spark, sf0001, k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => cand(r._2)))
  }

  test("mmr: diversification changes the order vs pure relevance") {
    val diverse = HybridSearch.mmrTopK(spark, sf0001, k = 10, lambda = 0.3)
      .orderBy(col("rank")).collect().map(_.getLong(1))
    val plain = ExactKnn.topKSingle(spark, sf0001, k = 10)
      .collect().map(r => r.getLong(0))
    // λ=0.3 weights diversity heavily; on gaussian fixture data the
    // greedy must deviate from the pure-distance ranking
    assert(!diverse.sameElements(plain))
  }
}
