package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.knn.ExactKnn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 appears in [[queries]];
  * SQL-expressible ones also appear in [[oracleSql]] (DuckDB-compatible,
  * same column names/aliases as the Spark output — the driver sorts
  * columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end pipeline in one plan: ingest -> split ->
    * exact top-10 neighbors of held-out query 29 by cosine distance
    * (`/root/reference/src/main.rs:61-94`).
    */
  def entry(spark: SparkSession): DataFrame =
    ExactKnn.topKSingle(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_exact_single" -> ((s, dir) => ExactKnn.topKSingle(s, dir)),
    "knn_exact_batch"  -> ((s, dir) => ExactKnn.topKBatch(s, dir)),
  )

  /** DuckDB-runnable oracle SQL, same tables, same column names. */
  def oracleSql: Map[String, String] = Map(
    "knn_exact_single" -> s"""
      WITH e AS (SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                 FROM embeddings),
      p AS (SELECT CAST(round(0.95 * count(*)) AS BIGINT) AS s, count(*) AS c FROM e)
      SELECT b.vec_id, $cosDistSql AS dist
      FROM e b, e q, p
      WHERE b.vec_id < p.s AND q.vec_id = p.s + (29 % (p.c - p.s))
      ORDER BY dist, b.vec_id LIMIT 10""",
    "knn_exact_batch" -> s"""
      WITH e AS (SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                 FROM embeddings),
      p AS (SELECT CAST(round(0.95 * count(*)) AS BIGINT) AS s FROM e),
      d AS (SELECT q.vec_id AS qid, b.vec_id, $cosDistSql AS dist
            FROM e b, e q, p
            WHERE b.vec_id < p.s AND q.vec_id >= p.s)
      SELECT qid, vec_id, dist,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS INT) AS rk
      FROM d
      QUALIFY rk <= 10""",
  )

  /** Shared DuckDB fragment: clamped cosine distance between list columns
    * `b.emb` and `q.emb`, rounded to 6 (same fold + rounding as
    * [[graft.functions.VectorFunctions]] — SURVEY.md §7.4).
    */
  private val cosDistSql: String =
    """round(1 - greatest(
         list_sum(list_transform(list_zip(b.emb, q.emb), z -> z[1]*z[2])) /
         (sqrt(list_sum(list_transform(b.emb, x -> x*x))) *
          sqrt(list_sum(list_transform(q.emb, x -> x*x)))), 0), 6)"""
}
