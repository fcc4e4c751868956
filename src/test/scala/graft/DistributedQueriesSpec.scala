package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ANN query side is fully distributed: query vectors stay a
  * DataFrame end to end — they are never collected to the driver and
  * re-injected as local rows. Pinned two ways: (a) no executed ANN
  * batch plan contains a LocalTableScan (the signature of
  * driver-materialized rows), and (b) the HNSW scatter-gather lineage
  * is the zipPartitions probe against the pinned shard layout, not a
  * union of per-block sub-plans.
  */
class DistributedQueriesSpec extends SparkSpec {

  private def assertNoDriverRows(name: String, df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"),
      s"$name re-injects driver-materialized rows:\n$plan")
    val lineage = df.rdd.toDebugString
    assert(!lineage.contains("UnionRDD"),
      s"$name still unions per-block sub-plans:\n$lineage")
  }

  test("hnsw / pq / sq batches: zipPartitions scatter-gather lineage") {
    for ((name, df) <- Seq(
        "hnsw" -> HnswKnn.topKBatch(spark, sf0001),
        "pq" -> PqKnn.topKBatch(spark, sf0001),
        "sq" -> SqKnn.topKBatch(spark, sf0001))) {
      assertNoDriverRows(name, df)
      assert(df.rdd.toDebugString.contains("ZippedPartitionsRDD2"),
        s"$name: expected the zipPartitions scatter-gather probe in the lineage")
    }
  }

  test("ivfpq / mrl / lifecycle batches: no LocalTableScan") {
    assertNoDriverRows("ivfpq", IvfPqKnn.topKBatch(spark, sf0001))
    assertNoDriverRows("mrl", MatryoshkaKnn.topKBatch(spark, sf0001))
    assertNoDriverRows("ivf_lifecycle", IvfKnn.topKBatchLifecycle(spark, sf0001))
    assertNoDriverRows("hnsw_lifecycle", HnswKnn.topKBatchLifecycle(spark, sf0001))
  }

  test("every held-out query is answered by the distributed paths") {
    val nq = ExactKnn.split(spark, sf0001)._2.count()
    for ((name, df) <- Seq(
        "hnsw" -> HnswKnn.topKBatch(spark, sf0001),
        "pq" -> PqKnn.topKBatch(spark, sf0001),
        "sq" -> SqKnn.topKBatch(spark, sf0001),
        "ivfpq" -> IvfPqKnn.topKBatch(spark, sf0001),
        "mrl" -> MatryoshkaKnn.topKBatch(spark, sf0001)))
      assert(df.select("qid").distinct().count() == nq, s"$name dropped queries")
  }

  test("PqAdcDistance expression matches the nested-array adcSim fold") {
    import spark.implicits._
    val (base, queries, _, _) = ExactKnn.split(spark, sf0001)
    val q = queries.limit(3).select(col("vec_id").as("qid"), col("emb").as("qvec"))
    val qMap = q.as[(Long, Array[Double])].collect().toMap
    // PQ: flattened-LUT expression vs the nested-array adcSim fold
    val cb = PqKnn.trainCodebooks(base, m = 8, ksub = 16)
    val pqEnc = PqKnn.encode(base.limit(50), cb)
    val luts = PqKnn.queryLutsDF(queries.limit(3), cb, 16)
    val viaPq = pqEnc.crossJoin(broadcast(luts))
      .select(col("vec_id"), col("qid"),
        graft.functions.QuantizedDistances
          .pqAdcDistance(col("codes"), col("lut"), 16).as("d"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val pqCodes = pqEnc.as[(Long, Array[Byte])].collect().toMap
    for (((vid, qid), d) <- viaPq) {
      val expected = 1.0 - math.max(
        PqKnn.adcSim(PqKnn.queryLut(cb, qMap(qid)), pqCodes(vid)), 0.0)
      assert(d == expected, s"pq expr $d != fold $expected for ($vid,$qid)")
    }
  }
}
