package graft

import org.apache.spark.sql.DataFrame

import graft.knn.{HnswKnn, IvfPqKnn, PqKnn, QueryBlocks}

/** The ANN batch paths must produce identical results whether the
  * query split fits in one driver block or is streamed through many
  * ([[QueryBlocks.chunked]]'s bound). sf0.001 has 25 held-out queries;
  * a bound of 7 forces 4 blocks.
  */
class QueryBlocksSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("hnsw topKBatch: chunked equals single-block, bit for bit") {
    val whole = rows(HnswKnn.topKBatch(spark, sf0001))
    val chunked = rows(HnswKnn.topKBatch(spark, sf0001, maxQueryBatch = 7))
    assert(chunked == whole)
    assert(whole.nonEmpty)
  }

  test("pq topKBatch: chunked equals single-block, bit for bit") {
    val whole = rows(PqKnn.topKBatch(spark, sf0001))
    val chunked = rows(PqKnn.topKBatch(spark, sf0001, maxQueryBatch = 7))
    assert(chunked == whole)
    assert(whole.nonEmpty)
  }

  test("ivfpq topKBatch: chunked equals single-block, bit for bit") {
    val whole = rows(IvfPqKnn.topKBatch(spark, sf0001))
    val chunked = rows(IvfPqKnn.topKBatch(spark, sf0001, maxQueryBatch = 7))
    assert(chunked == whole)
    assert(whole.nonEmpty)
  }
}
