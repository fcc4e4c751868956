package graft.knn

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * partition-pruning ANN formulation, complementing the graph-based
  * [[HnswKnn]]: cluster the base vectors around k-means centroids, then
  * search only the `nprobe` clusters nearest to each query.
  *
  * Scale notes (100 TB thinking):
  *   - Centroids are tiny (k x dim doubles) and travel as a broadcast
  *     literal; cluster assignment is a map-only codegen'd argmin over
  *     that literal — the base table is never shuffled to train or assign
  *     (Lloyd updates aggregate (cid, pos, sum) partials only).
  *   - At scale the assigned table would be written bucketed/partitioned
  *     BY cid, making each query's probe set a partition-pruned scan of
  *     nprobe/k of the data — that pruning is the entire point of IVF.
  *   - The probe join broadcasts the exploded (qid, cid) pairs, so the
  *     big side again never shuffles; per-query cost is nprobe clusters
  *     instead of the full base.
  */
object IvfKnn {

  /** Index of the nearest centroid (0-based) for a vector column, given
    * centroids as an array-of-arrays literal.
    */
  private def nearestCid(cLit: Column, v: Column): Column = {
    val dists = transform(cLit, c => graft.functions.ArrayMath.cosineDistance(c, v))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Lloyd's k-means over an `emb` column (cosine-distance assignment,
    * mean update). Deterministic: seeds are the k lowest-vec_id vectors.
    * Centroids are collected each iteration (k x dim — driver-tiny).
    */
  def trainCentroids(base: DataFrame, k: Int, iters: Int = 3): Seq[Seq[Double]] = {
    var centroids: Seq[Seq[Double]] = base.orderBy("vec_id").limit(k)
      .select("emb").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val cLit = typedLit(centroids)
      val sums = base
        .withColumn("cid", nearestCid(cLit, col("emb")))
        .select(col("cid"), posexplode(col("emb")))
        .groupBy("cid", "pos").agg(avg("col").as("m"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCid.get(c) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None       => centroids(c) // empty cluster keeps its seed
        }
      }
    }
    centroids
  }

  /** Top-k for every held-out query, probing `nprobe` of `nCentroids`
    * clusters (defaults: sqrt(n) centroids, a quarter of them probed).
    * Output: (qid, vec_id, dist rounded 6, rk) — same shape as
    * [[ExactKnn.topKBatch]] for direct recall evaluation.
    */
  def topKBatch(spark: SparkSession, dir: String, k: Int = 10,
      nCentroids: Int = 0, nprobe: Int = 0): DataFrame = {
    val (base, queries, _, n) = ExactKnn.split(spark, dir)
    val nC = if (nCentroids > 0) nCentroids
             else math.max(4, math.sqrt(n.toDouble).toInt)
    val nP = if (nprobe > 0) nprobe else math.max(2, nC / 2)
    val centroids = trainCentroids(base, nC)
    val cLit = typedLit(centroids)

    val assigned = base.withColumn("cid", nearestCid(cLit, col("emb")))
    // nprobe nearest centroids per query, via sort of (dist, cid) structs
    val scoredCentroids = transform(sequence(lit(0), lit(nC - 1)), i =>
      struct(graft.functions.ArrayMath.cosineDistance(element_at(cLit, i + 1), col("qvec")).as("d"),
        i.as("cid")))
    val probes = transform(slice(sort_array(scoredCentroids), 1, nP),
      s => s.getField("cid"))
    val q = queries.select(col("vec_id").as("qid"), col("emb").as("qvec"))
      .withColumn("cid", explode(probes))

    val scored = assigned.join(broadcast(q), "cid")
      .select(col("qid"), col("vec_id"),
        ExactKnn.dist(col("emb"), col("qvec")).as("dist"))
    graft.plans.GraftOps.topKPerGroup(scored, Seq("qid"),
      Seq("dist" -> true, "vec_id" -> true), k)
  }
}
