package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** SQL-facing entry to the kNN indexes (the reference's one polymorphic
  * surface, `/root/reference/src/index.rs:4-10`, exposed to `spark.sql`
  * users): a Data Source V1 relation, so index search is reachable from
  * pure SQL with no Scala imports —
  *
  * {{{
  * CREATE TEMPORARY VIEW knn
  * USING graft.sources.KnnDataSource
  * OPTIONS (dir '/data/sf0.01', backend 'hnsw', k '10')
  * SELECT * FROM knn WHERE qid = 475 ORDER BY rk
  * }}}
  *
  * Backends map to the library entry points (same plans, same caches —
  * the relation only defers execution to scan time):
  *   - `exact`       — single-query brute-force top-k: (vec_id, dist);
  *                     options `k`, `queryIdx`
  *   - `exact_batch` — every held-out query: (qid, vec_id, dist, rk)
  *   - `hnsw`        — sharded graph ANN batch: (qid, vec_id, dist, rk);
  *                     options `k`, `ef`, `shards`
  *   - `ivf`         — cluster-pruned ANN batch: (qid, vec_id, dist, rk);
  *                     options `k`, `nCentroids`, `nprobe`
  *   - `pq` / `sq` / `ivfpq` / `rp` / `bq` / `bq256` — the quantized/
  *                     projected ANN batches, same output shape; options
  *                     mirror each family's entry point (`m`, `ksub`,
  *                     `nCentroids`, `nprobe`, `outDim`, `overfetch`,
  *                     `nBits`)
  *   - `search`      — top-k for a USER-SUPPLIED query vector over the
  *                     whole embeddings table (the reference's
  *                     `index.search(query)` from SQL): (vec_id, dist);
  *                     options `vector` (comma-separated doubles), `k`
  *
  * The scan stays fully distributed (it returns the underlying
  * DataFrame's rows); nothing is materialized on the driver at view
  * creation — schema resolution builds the plan only.
  */
class KnnDataSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-knn"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val df = KnnBackends.frame(ctx.sparkSession, parameters)
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }
}

/** The backend-name -> result-frame switch shared by the DSv1 relation
  * above and the DSv2 table ([[KnnDataSourceV2]]): one option-parsing
  * surface, two source-API bindings.
  */
private[sources] object KnnBackends {

  def frame(spark: org.apache.spark.sql.SparkSession,
      parameters: Map[String, String]): org.apache.spark.sql.DataFrame = {
    def opt(key: String): Option[String] =
      parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
    val dir = opt("dir").getOrElse(
      throw new IllegalArgumentException("graft-knn: option 'dir' is required"))
    val k = opt("k").map(_.toInt).getOrElse(10)
    opt("backend").map(_.toLowerCase).getOrElse("exact") match {
      case "exact" =>
        graft.knn.ExactKnn.topKSingle(spark, dir, k,
          opt("queryIdx").map(_.toLong).getOrElse(29L))
      case "exact_batch" =>
        graft.knn.ExactKnn.topKBatch(spark, dir, k)
      case "hnsw" =>
        graft.knn.HnswKnn.topKBatch(spark, dir, k,
          opt("ef").map(_.toInt).getOrElse(100),
          opt("shards").map(_.toInt).getOrElse(16))
      case "ivf" =>
        graft.knn.IvfKnn.topKBatch(spark, dir, k,
          opt("nCentroids").map(_.toInt).getOrElse(0),
          opt("nprobe").map(_.toInt).getOrElse(0))
      case "pq" =>
        graft.knn.PqKnn.topKBatch(spark, dir, k,
          opt("m").map(_.toInt).getOrElse(8),
          opt("ksub").map(_.toInt).getOrElse(256),
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "sq" =>
        graft.knn.SqKnn.topKBatch(spark, dir, k,
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "ivfpq" =>
        graft.knn.IvfPqKnn.topKBatch(spark, dir, k,
          opt("nCentroids").map(_.toInt).getOrElse(0),
          opt("nprobe").map(_.toInt).getOrElse(0),
          opt("m").map(_.toInt).getOrElse(8),
          opt("ksub").map(_.toInt).getOrElse(256),
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "rp" =>
        graft.knn.RandomProjection.topKBatch(spark, dir, k,
          opt("outDim").map(_.toInt).getOrElse(32),
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "bq" =>
        graft.knn.BinaryQuantKnn.topKBatch(spark, dir, k,
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "bq256" =>
        graft.knn.BinaryQuantKnn.topKBatchWide(spark, dir, k,
          opt("overfetch").map(_.toInt).getOrElse(16),
          opt("nBits").map(_.toInt).getOrElse(256))
      case "mrl" =>
        graft.knn.MatryoshkaKnn.topKBatch(spark, dir, k)
      case "opq" =>
        graft.knn.OpqKnn.topKBatch(spark, dir, k,
          opt("m").map(_.toInt).getOrElse(8),
          opt("ksub").map(_.toInt).getOrElse(256),
          opt("overfetch").map(_.toInt).getOrElse(16))
      case "vamana" =>
        graft.knn.VamanaKnn.topKBatch(spark, dir, k,
          opt("ef").map(_.toInt).getOrElse(100),
          opt("shards").map(_.toInt).getOrElse(16))
      case "search" =>
        val vec = opt("vector").getOrElse(throw new IllegalArgumentException(
            "graft-knn: backend 'search' requires option 'vector'"))
          .split(",").map(_.trim.toDouble).toSeq
        import org.apache.spark.sql.functions.{col, typedlit}
        graft.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
              .as("emb"))
          .select(col("vec_id"),
            graft.knn.ExactKnn.dist(col("emb"), typedlit(vec)).as("dist"))
          .orderBy(col("dist").asc, col("vec_id").asc)
          .limit(k)
      case other =>
        throw new IllegalArgumentException(
          s"graft-knn: unknown backend '$other' (expected exact, " +
            "exact_batch, hnsw, ivf, pq, sq, ivfpq, rp, bq, bq256, mrl, " +
            "opq, vamana, search)")
    }
  }
}
