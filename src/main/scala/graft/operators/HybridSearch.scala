package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.knn.ExactKnn

/** Hybrid lexical + vector retrieval via reciprocal-rank fusion
  * (Cormack et al. 2009): fuse a BM25 ranking over `documents` with a
  * cosine ranking over `embeddings` (doc_id ↔ vec_id) as
  *
  *   rrf(d) = Σ_lists 1 / (kRrf + rank_list(d)),
  *
  * missing membership contributing 0. RRF needs only ranks — no score
  * normalization across incomparable scales — which is why it is the
  * standard fusion for heterogeneous retrievers.
  *
  * Scale notes: both input rankings are top-`depth` RESULTS (bounded:
  * depth rows each), so the rank windows and the full-outer fusion join
  * run on k-sized relations — the expensive work happened inside the
  * two retrievals, each already in its scale shape (BM25's broadcast
  * stats; the kNN broadcast scan / any ANN index). Fusing ANN instead
  * of exact kNN is swapping the vector leg's function.
  */
object HybridSearch {

  /** Top-`k` fused results. Output: (doc_id, rrf rounded 6, bm25_rank,
    * vec_rank) — null rank marks absence from that leg's top-`depth`.
    */
  def rrfTopK(spark: SparkSession, dir: String,
      terms: Seq[String] = TextOps.bm25GeneralTerms, queryIdx: Long = 29,
      k: Int = 20, depth: Int = 100, kRrf: Int = 60): DataFrame = {
    // lexical leg: top-`depth` BM25 docs, ranked (score desc, doc_id)
    val bm = TextOps.bm25TopKExploded(spark, dir, terms, k = depth)
      .withColumn("bm25_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("bm25_rank"))
    // vector leg: top-`depth` neighbors of held-out query `queryIdx`,
    // ranked (dist asc, vec_id) — ExactKnn emits them ordered already
    val vec = ExactKnn.topKSingle(spark, dir, k = depth, queryIdx)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("dist").asc, col("vec_id").asc)))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    // both legs are depth-bounded: the windows above and this join run
    // on k-sized inputs (single-partition windows are fine at depth=100)
    bm.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (col("bm25_rank") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("vec_rank") + kRrf), lit(0.0)), 6)
          .as("rrf"),
        col("bm25_rank"), col("vec_rank"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }
}
