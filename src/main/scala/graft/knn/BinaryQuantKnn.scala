package graft.knn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.IndexCache

/** Binary (1-bit sign) quantization ANN — the most compressed member of
  * the engine's quantization family (next to SQ8's 8-bit
  * [[SqKnn]] and PQ's codebook [[PqKnn]]): each dimension collapses to
  * its sign bit, a 64-dim vector becomes ONE 64-bit word, and the coarse
  * distance is a single `XOR` + `popcount` per comparison. Candidates
  * mined under Hamming distance are then re-ranked exactly, the same
  * coarse-scan/re-rank shape as [[RandomProjection.topKBatch]].
  *
  * Sign-at-zero is the right quantizer here because the fixture
  * embeddings are zero-centered per dimension (measured |mean| < 1e-4);
  * a centered corpus is also the production norm (most embedding models
  * emit roughly zero-mean dims). Keeping the threshold a constant (not a
  * trained per-dim mean) makes the whole index deterministic with no
  * training pass at all — insertion is stateless, so the code table can
  * be maintained incrementally by any writer.
  *
  * Scale notes (100 TB thinking):
  *   - 64x compression: the 100 TB float corpus scans as ~1.6 TB of
  *     codes — the coarse pass reads ONE LONG per row, and the XOR +
  *     `bit_count` compare stays inside whole-stage codegen (both are
  *     codegen'd built-ins; no UDF, no boxing).
  *   - Map-only coarse scan: query codes broadcast (8 bytes per query),
  *     per-query candidates pruned by the bounded-heap
  *     [[graft.plans.TopKPerGroup]] in its two-phase form, so the
  *     shuffle carries <= partitions x queries x overfetch (qid, id,
  *     hamming) triples — never the codes, never the vectors.
  *   - Exact re-rank touches only (queries x k x overfetch) full
  *     vectors via an id equi-join against the base table.
  *   - Deterministic end to end: constant quantizer, integer Hamming
  *     distances (no FP at the coarse stage at all), vec_id tie-break.
  */
object BinaryQuantKnn {

  /** (vec_id, code) — pack sign bits of up to 64 dims into one long.
    * Map-only typed loop (a HOF would interpret per element; the loop
    * compiles to straight-line JVM code).
    */
  def encode(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("vec_id"), col("emb")).as[(Long, Array[Double])]
      .map { case (id, v) =>
        var code = 0L
        var i = 0
        val n = math.min(v.length, 64)
        while (i < n) { if (v(i) > 0.0) code |= (1L << i); i += 1 }
        (id, code)
      }.toDF("vec_id", "code")
  }

  /** Top-k per held-out query: Hamming-space candidate mining
    * (k * overfetch) over the packed codes + exact re-rank. Output:
    * (qid, vec_id, dist, rk) — the recall-evaluation shape shared by
    * every ANN family.
    *
    * Overfetch is high (16x) for the same reason as
    * [[RandomProjection.topKBatch]]: near-random fixture geometry gives
    * tiny neighbor margins, and a 1-bit code keeps only the orthant —
    * the candidate FRACTION k*overfetch/n still vanishes as n grows.
    */
  def topKBatch(spark: SparkSession, dir: String, k: Int = 10,
      overfetch: Int = 16): DataFrame = {
    val (base, queries, _, _) = ExactKnn.split(spark, dir)

    val codes = IndexCache.getOrBuild(spark, s"bq:$dir") {
      val c = encode(base).persist(StorageLevel.MEMORY_AND_DISK)
      c.count() // materialize the code table once (the scan target)
      c
    }
    val qCodes = broadcast(encode(queries)
      .select(col("vec_id").as("qid"), col("code").as("qcode")))

    val cand = graft.plans.GraftOps.topKPerGroup(
      codes.crossJoin(qCodes)
        .select(col("qid"), col("vec_id"),
          bit_count(col("code").bitwiseXOR(col("qcode"))).as("hamming")),
      Seq("qid"), Seq("hamming" -> true, "vec_id" -> true), k * overfetch,
      partialFirst = true)

    // exact re-rank of the candidate set only
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("emb").as("qvec")))
    val rescored = cand.select("qid", "vec_id")
      .join(base, "vec_id")
      .join(q, "qid")
      .select(col("qid"), col("vec_id"),
        ExactKnn.dist(col("emb"), col("qvec")).as("dist"))
    graft.plans.GraftOps.topKPerGroup(rescored, Seq("qid"),
      Seq("dist" -> true, "vec_id" -> true), k)
  }
}
