package graft.knn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.IndexCache

/** IVF-PQ: the composition of the two scale levers — IVF cluster
  * routing prunes WHICH vectors are visited (nprobe/k of the corpus),
  * PQ codes shrink WHAT is read per visited vector (8 bytes, ADC
  * lookup adds). This is the standard billion-scale ANN layout
  * (FAISS's IndexIVFPQ; Jégou et al. 2011 §IV): at 100 TB of raw
  * embeddings the probed fraction of the code table is all that moves,
  * and the full-precision vectors are touched only for the final
  * re-rank of `overfetch * k` candidates per query.
  *
  * Candidate scoring is MAP-ONLY: the per-query lookup tables are
  * grouped by probed cluster and broadcast, so each code row fans out
  * exactly to the queries probing its cluster — no shuffle ever sees
  * the code table.
  */
object IvfPqKnn {

  /** Top-k for every held-out query. Output: (qid, vec_id, dist
    * rounded 6, rk) — same shape as [[ExactKnn.topKBatch]]. The query
    * split reaches the driver in blocks of at most `maxQueryBatch`
    * rows ([[QueryBlocks]]), never whole.
    */
  def topKBatch(spark: SparkSession, dir: String, k: Int = 10,
      nCentroids: Int = 0, nprobe: Int = 0, m: Int = 8, ksub: Int = 256,
      overfetch: Int = 16,
      maxQueryBatch: Int = QueryBlocks.DefaultMaxQueryBatch): DataFrame = {
    import spark.implicits._
    val (base, queries, _, n) = ExactKnn.split(spark, dir)
    val nC = if (nCentroids > 0) nCentroids
             else math.max(4, math.sqrt(n.toDouble).toInt)
    val nP = if (nprobe > 0) nprobe else math.max(2, nC / 2)

    // build once per dataset: centroids + per-vector (cid, codes)
    val (centroids, cb, lists) =
      IndexCache.getOrBuild(spark, s"ivfpq:$dir:$nC:$m:$ksub") {
        val cs = IvfKnn.trainCentroids(base, nC).map(_.toArray).toArray
        val books = PqKnn.trainCodebooks(base, m, ksub)
        val coded = PqKnn.encode(base, books)
          .join(IvfKnn.assignCids(base, cs).select("vec_id", "cid"), "vec_id")
          .persist(StorageLevel.MEMORY_AND_DISK)
        coded.count()
        (cs, books, coded)
      }

    def searchBlock(qs: Array[(Long, Array[Double])]): DataFrame = {
      // probe routing + one ADC lookup table per query, grouped by cid
      val byCid: Map[Int, Array[(Long, Array[Array[Double]])]] = qs
        .flatMap { case (qid, qv) =>
          val lut = PqKnn.queryLut(cb, qv)
          IvfKnn.probeCids(centroids, qv, nP).map(c => (c, (qid, lut)))
        }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
      val bc = spark.sparkContext.broadcast(byCid)

      val scored = lists.select(col("vec_id"), col("codes"), col("cid"))
        .as[(Long, Array[Byte], Int)]
        .mapPartitions { it =>
          val probers = bc.value
          it.flatMap { case (id, codes, cid) =>
            probers.getOrElse(cid, Array.empty[(Long, Array[Array[Double]])])
              .iterator.map { case (qid, lut) =>
                (qid, id, 1.0 - math.max(PqKnn.adcSim(lut, codes), 0.0))
              }
          }
        }.toDF("qid", "vec_id", "approx_dist")
      val cand = graft.plans.GraftOps.topKPerGroup(scored, Seq("qid"),
        Seq("approx_dist" -> true, "vec_id" -> true), overfetch * k)
        .select("qid", "vec_id")

      val bq = broadcast(qs.toSeq.map { case (qid, qv) => (qid, qv.toSeq) }
        .toDF("qid", "qvec"))
      val exact = cand.join(base, "vec_id").join(bq, "qid")
        .select(col("qid"), col("vec_id"),
          ExactKnn.dist(col("emb"), col("qvec")).as("dist"))
      graft.plans.GraftOps.topKPerGroup(exact, Seq("qid"),
        Seq("dist" -> true, "vec_id" -> true), k)
    }

    QueryBlocks.chunked(
      queries.select(col("vec_id"), col("emb")).as[(Long, Array[Double])],
      maxQueryBatch)(searchBlock)
  }
}
