package graft

/** Pins the r14 overfetch-sweep optimization: an arm cut from the ONE
  * deep ADC scan (`rk <= of * k` over the overfetch=max ranking) must
  * re-rank to exactly the rows the former per-arm `PqKnn.topKBatch`
  * produced — the prefix property (same sort keys, same vec_id ties)
  * is what makes sharing the scan an optimization rather than a
  * semantic change.
  */
class PqSweepPrefixSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("a shallow overfetch arm cut from the deep coarse scan re-ranks " +
      "bit-equal to the direct per-arm search") {
    val k = 10
    val (base, queries, _, _) = knn.ExactKnn.split(spark, sf0001)
    val deep = knn.PqKnn.coarseCandidates(spark, sf0001, k, overfetch = 16)
    for (of <- Seq(1, 4)) {
      val viaPrefix = knn.ExactKnn.rerank(
          deep.filter(col("rk") <= of * k).select("qid", "vec_id"),
          base, queries, k)
        .orderBy("qid", "rk").collect().toSeq
      val direct = knn.PqKnn.topKBatch(spark, sf0001, k, overfetch = of)
        .orderBy("qid", "rk").collect().toSeq
      assert(viaPrefix == direct, s"overfetch=$of arm diverged")
    }
  }
}
