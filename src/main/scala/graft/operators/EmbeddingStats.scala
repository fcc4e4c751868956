package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space analytics over the `embeddings` fixture — the
  * aggregate views a training pipeline reads to monitor cluster/label
  * drift (centroid geometry), complementing the per-vector ops in
  * [[graft.knn]] and [[Dedup]].
  */
object EmbeddingStats {

  /** Pairwise euclidean distances between per-label centroids — the
    * label-drift / cluster-separation matrix. Output: one row per
    * unordered label pair (label_a < label_b, dist rounded 6).
    *
    * Exactness across engines: each float coordinate is quantized to an
    * integer (round(v·1e6)) BEFORE the mean, so the per-dimension sums
    * are exact BIGINTs in any accumulation order; the centroid mean and
    * the distance fold then run on bit-identical doubles in a fixed
    * per-dimension order (array fold, like every declared distance).
    *
    * Scale shape: one partial-aggregatable (label, dim) sum over the
    * exploded coordinates, a |labels|-sized centroid relation, and a
    * |labels|²/2 self-join of that tiny relation — the fact table is
    * touched exactly once regardless of vector count.
    */
  def centroidDistances(spark: SparkSession, dir: String,
      q: Long = 1000000L): DataFrame = {
    val perDim = Tables.embeddings(spark, dir)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(round(col("v") * q, 0).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("sq").cast("double") / (col("n") * q)).as("m"))
    val cent = perDim.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("c"))
    val a = cent.select(col("label").as("label_a"), col("c").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("c").as("cb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(sqrt(aggregate(
          zip_with(col("ca"), col("cb"), (x, y) => (x - y) * (x - y)),
          lit(0d), (acc, x) => acc + x)), 6).as("centroid_dist"))
  }
}
