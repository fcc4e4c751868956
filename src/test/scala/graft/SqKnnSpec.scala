package graft

import graft.knn.{ExactKnn, SqKnn}
import graft.operators.Evaluation

class SqKnnSpec extends SparkSpec {

  test("sq8: every query answered with <= k rows, ascending, rk dense") {
    val res = SqKnn.topKBatch(spark, sf0001).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rows.length))
      val dists = byRank.map(_.getDouble(2)).toSeq
      assert(dists == dists.sorted)
    }
  }

  test("sq8: recall@10 vs exact >= 0.8 (8x compression, 16x overfetch)") {
    val sq = SqKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val recall = Evaluation.recall(sq, exact).head.getDouble(0)
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("sq8: round-trip quantization error is bounded by half a step") {
    import spark.implicits._
    val (base, _, _, _) = ExactKnn.split(spark, sf0001)
    val bounds = SqKnn.trainBounds(base)
    val spans = bounds.mins.zip(bounds.maxs).map(t => t._2 - t._1)
    val decodedErr = SqKnn.encode(base, bounds)
      .join(base, "vec_id")
      .as[(Long, Array[Byte], Array[Double])]
      .map { case (_, codes, v) =>
        codes.indices.map { i =>
          val x = bounds.mins(i) + (codes(i) & 0xff) / 255.0 * spans(i)
          math.abs(x - v(i)) / math.max(spans(i), 1e-12)
        }.max
      }.reduce(math.max _)
    assert(decodedErr <= 0.5 / 255.0 + 1e-9,
      s"max normalized round-trip error $decodedErr exceeds half a step")
  }
}
