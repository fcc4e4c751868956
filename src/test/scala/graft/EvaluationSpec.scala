package graft

import graft.knn.{ExactKnn, HnswKnn}
import graft.operators.Evaluation

/** Ranking metrics on synthetic rankings with hand-computed values,
  * plus quality gates for the approximate indexes.
  */
class EvaluationSpec extends SparkSpec {

  test("MRR on a known ranking") {
    import spark.implicits._
    // q1: first relevant at rank 2 -> 1/2; q2: at rank 1 -> 1;
    // q3: no relevant hit -> 0. MRR = (0.5 + 1 + 0) / 3 = 0.5
    val retrieved = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (3L, 30L, 1)).toDF("qid", "vec_id", "rk")
    val relevant = Seq((1L, 11L), (1L, 12L), (2L, 20L), (3L, 99L))
      .toDF("qid", "vec_id")
    val mrr = Evaluation.meanReciprocalRank(retrieved, relevant)
      .head.getDouble(0)
    assert(mrr == 0.5)
  }

  test("nDCG@k on a known ranking") {
    import spark.implicits._
    // q1: relevant at ranks 1 and 3 of k=3, |rel|=2
    //   dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5 = 1.5
    //   idcg = 1/log2(2) + 1/log2(3)
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "vec_id", "rk")
    val relevant = Seq((1L, 10L), (1L, 12L)).toDF("qid", "vec_id")
    val ndcg = Evaluation.ndcgAtK(retrieved, relevant, 3).head.getDouble(0)
    val expected = 1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(ndcg - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("identities: MRR, nDCG, and MAP of a ranking against itself are 1.0") {
    val ex = ExactKnn.topKBatch(spark, sf0001)
    val rel = ex.select("qid", "vec_id")
    assert(Evaluation.meanReciprocalRank(ex, rel).head.getDouble(0) == 1.0)
    assert(Evaluation.ndcgAtK(ex, rel, 10).head.getDouble(0) == 1.0)
    assert(Evaluation.meanAveragePrecision(ex, rel).head.getDouble(0) == 1.0)
  }

  test("MAP on a known ranking, incl. a zero-relevance query") {
    import spark.implicits._
    // q1: hits at ranks 1 and 3, |rel|=3 -> AP = (1/1 + 2/3)/3 = 5/9
    // q2: retrieved but nothing relevant -> AP = 0; MAP = 5/18
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1)).toDF("qid", "vec_id", "rk")
    val relevant = Seq((1L, 10L), (1L, 12L), (1L, 13L)).toDF("qid", "vec_id")
    val map = Evaluation.meanAveragePrecision(retrieved, relevant)
      .head.getDouble(0)
    val expected = BigDecimal((1.0 + 2.0 / 3.0) / 3.0 / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(map - expected) < 1e-9, s"map=$map expected=$expected")
  }

  test("sampled ground truth is exactly the full ground truth on its qids") {
    import org.apache.spark.sql.functions._
    val full = ExactKnn.topKBatch(spark, sf0001)
    val sampled = ExactKnn.topKBatchSampled(spark, sf0001, everyNth = 5)
    val splitAt = ExactKnn.split(spark, sf0001)._3
    // the sample is every 5th held-out qid, deterministically
    val qids = sampled.select("qid").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(qids.nonEmpty && qids.forall(q => (q - splitAt) % 5 == 0))
    val restricted = full
      .join(sampled.select("qid").distinct(), Seq("qid"), "left_semi")
      .collect().toSet
    assert(sampled.collect().toSet == restricted,
      "sampled GT must be the full GT restricted to the sampled qids")
    // and the sampled-recall estimate tracks the full recall
    val hnsw = HnswKnn.topKBatch(spark, sf0001)
    val est = Evaluation.recall(
      hnsw.join(sampled.select("qid").distinct(), Seq("qid"), "left_semi")
        .select("qid", "vec_id"),
      sampled.select("qid", "vec_id")).head.getDouble(0)
    assert(est >= 0.8, s"sampled recall estimate $est implausibly low")
  }

  test("hnsw quality gates: MRR and nDCG vs the exact oracle") {
    val hnsw = HnswKnn.topKBatch(spark, sf0001)
    val rel = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val mrr = Evaluation.meanReciprocalRank(hnsw, rel).head.getDouble(0)
    val ndcg = Evaluation.ndcgAtK(hnsw, rel, 10).head.getDouble(0)
    assert(mrr >= 0.85, s"hnsw MRR $mrr below 0.85")
    assert(ndcg >= 0.85, s"hnsw nDCG $ndcg below 0.85")
  }

  test("pq overfetch sweep: recall climbs with re-rank depth to >= 0.95") {
    val curve = Evaluation.pqOverfetchSweep(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(curve.map(_._1).sameElements(Array(1, 4, 16)))
    curve.sliding(2).foreach {
      case Array((_, r1), (of2, r2)) =>
        assert(r2 >= r1, s"recall fell at overfetch $of2: $r2 < $r1")
      case _ => ()
    }
    assert(curve.last._2 >= 0.95,
      s"deep re-rank recall ${curve.last._2} below gate")
  }
}
