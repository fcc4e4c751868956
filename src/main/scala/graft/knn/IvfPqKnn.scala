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
    * rounded 6, rk) — same shape as [[ExactKnn.topKBatch]].
    *
    * Distributed query side: probe routing runs executor-side
    * (map-only over the query split with the centroids broadcast), the
    * (qid, cid) probe relation equi-joins the code table on cid — each
    * code row fans out ONLY to the queries probing its cluster — and a
    * second broadcast join attaches the per-query flattened ADC table,
    * scored in codegen by [[graft.functions.PqAdcDistance]]. The probe
    * and LUT relations travel as ENGINE-MANAGED broadcasts (bounded by
    * nprobe x queries pairs and queries x m x ksub doubles); a query
    * split too large for a broadcast runs as waves of this plan or
    * flips to the zipPartitions replication [[PqKnn.topKBatch]] uses.
    */
  def topKBatch(spark: SparkSession, dir: String, k: Int = 10,
      nCentroids: Int = 0, nprobe: Int = 0, m: Int = 8, ksub: Int = 256,
      overfetch: Int = 16): DataFrame = {
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

    val bcC = spark.sparkContext.broadcast(centroids)
    val probes = queries.select(col("vec_id"), col("emb"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.flatMap { case (qid, qv) =>
          IvfKnn.probeCids(cs, qv, nP).iterator.map(c => (qid, c))
        }
      }.toDF("qid", "cid")

    val scored = lists.select(col("vec_id"), col("codes"), col("cid"))
      .join(broadcast(probes), "cid")
      .join(broadcast(PqKnn.queryLutsDF(queries, cb, ksub)), "qid")
      .select(col("qid"), col("vec_id"),
        graft.functions.QuantizedDistances
          .pqAdcDistance(col("codes"), col("lut"), ksub).as("approx_dist"))
    val cand = graft.plans.GraftOps.topKPerGroup(scored, Seq("qid"),
      Seq("approx_dist" -> true, "vec_id" -> true), overfetch * k)
      .select("qid", "vec_id")
    ExactKnn.rerank(cand, base, queries, k)
  }
}
