package graft

import org.apache.spark.sql.functions._

import graft.knn.{ExactKnn, OpqKnn}
import graft.operators.Evaluation

class OpqKnnSpec extends SparkSpec {

  test("opq rotation: orthonormal rows, balanced eigen-allocation") {
    val r = OpqKnn.rotation(spark, sf0001, m = 8)
    val d = r.length
    assert(r.forall(_.length == d))
    // orthonormality: R Rᵀ = I (Jacobi V columns, permuted)
    for (i <- 0 until d; j <- i until d) {
      var s = 0.0
      var t = 0
      while (t < d) { s += r(i)(t) * r(j)(t); t += 1 }
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(s - expect) < 1e-9, s"RRt($i,$j) = $s")
    }
    // every subspace gets exactly d/m dims (the allocation is a
    // permutation, not a projection)
    assert(d % 8 == 0)
  }

  test("opq: every query answered with k ascending exact-ranked rows") {
    val df = OpqKnn.topKBatch(spark, sf0001, k = 10).cache()
    val (_, queries, _, _) = ExactKnn.split(spark, sf0001)
    assert(df.select("qid").distinct().count() == queries.count())
    val perQ = df.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) == 10))
    assert(df.filter(col("dist") < 0 || col("dist") > 1).count() == 0)
    // re-rank is exact and in the ORIGINAL space: every (qid, vec_id,
    // dist) agrees with the brute-force distance
    val exact = ExactKnn.topKBatch(spark, sf0001, k = 50)
      .select(col("qid"), col("vec_id"), col("dist").as("edist"))
    val joined = df.join(exact, Seq("qid", "vec_id"))
    assert(joined.filter(col("dist") =!= col("edist")).count() == 0)
  }

  test("quantization distortion: positive, full-corpus, rotation not worse") {
    val rows = OpqKnn.quantizationDistortion(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet == Set("pq", "opq"))
    val (nBase, _, _, _) = {
      val (b, q, _, _) = ExactKnn.split(spark, sf0001)
      (b.count(), q, 0, 0)
    }
    rows.values.foreach { case (n, mse) =>
      assert(n == nBase, s"n=$n vs base $nBase")
      assert(mse > 0.0 && mse < 1.0, s"mse $mse")
    }
    // the rotation must not increase reconstruction error materially
    // (on anisotropic data it strictly lowers it — ScaleSpec pins that)
    assert(rows("opq")._2 <= rows("pq")._2 * 1.05,
      s"opq ${rows("opq")._2} vs pq ${rows("pq")._2}")
  }

  test("opq lifecycle: reloaded checkpoint answers bit-identically") {
    val live = OpqKnn.topKBatch(spark, sf0001).collect().toSet
    val reloaded = OpqKnn.topKBatchLifecycle(spark, sf0001).collect().toSet
    assert(reloaded == live)
  }

  test("opq: recall@10 vs exact >= 0.7; deterministic reruns") {
    val opq = OpqKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val exact = ExactKnn.topKBatch(spark, sf0001).select("qid", "vec_id")
    val r = Evaluation.recall(opq, exact).collect()(0).getDouble(0)
    assert(r >= 0.7, s"opq recall@10 = $r")
    val again = OpqKnn.topKBatch(spark, sf0001)
    assert(OpqKnn.topKBatch(spark, sf0001).collect().toSet ==
      again.collect().toSet)
  }
}
