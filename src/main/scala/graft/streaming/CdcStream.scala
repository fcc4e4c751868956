package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAMING CDC APPLY — the consumption half of the MERGE contract
  * ([[graft.sources.Ingest.mergeChangelogShowcase]] produces the
  * changelog; a real lakehouse also has a process that TAILS that
  * changelog and maintains the downstream table incrementally). The
  * file stream source tails the staged changelog one chunk per
  * micro-batch; each batch MERGEs its slice into a versioned state
  * table inside `foreachBatch` — the same read-prev / write-next
  * `v=<batchId>` overwrite discipline the crash-recovery spec proves
  * exactly-once for the other foreachBatch sinks here (re-running a
  * batch rewrites its version FROM the previous version, so a replay
  * after a crash converges to the identical state).
  *
  * Scale shape: each micro-batch costs one |batch|-bounded broadcast
  * join against the state scan plus one state rewrite — O(changes)
  * work per trigger with the table never collected anywhere; on a
  * lakehouse the `v=` directories are the table versions a
  * transaction log would track, and the rewrite becomes a
  * partition-scoped dynamic overwrite.
  */
object CdcStream {

  private val logSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("action", StringType),
    StructField("old_cents", LongType),
    StructField("new_cents", LongType)))

  /** Stage the deterministic changelog as `nChunks` single-file chunks
    * (keyed by pmod(o_orderkey, nChunks) — each key carries exactly one
    * action, so chunk order can never matter). Memoized per dataset.
    */
  private def stagedChangelogDir(spark: SparkSession, dir: String,
      nChunks: Int = 4): String =
    graft.IndexCache.getOrBuild(spark, s"orders-cdc-dir:$dir") {
      val out = EventStream.cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft-cdc-log")).toString
      val log = graft.sources.Ingest.mergeChangelogShowcase(spark, dir)
        .localCheckpoint(true)
      (0 until nChunks).foreach { i =>
        log.filter(pmod(col("o_orderkey"), lit(nChunks)) === i)
          .coalesce(1)
          .write.mode("append").parquet(out)
      }
      out
    }

  /** The initial (o_orderkey, cents) state rendered once per dataset —
    * a one-time export like the stream stagings, charged to
    * `bench_build_cdc_stage` so the declared row measures the apply
    * loop, not the base snapshot.
    */
  private def baseStateDir(spark: SparkSession, dir: String): String =
    graft.IndexCache.getOrBuild(spark, s"orders-cdc-base:$dir") {
      val base = EventStream.cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft-cdc-base")).toString
      graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .write.mode("overwrite").parquet(base)
      base
    }

  /** One-time staging for the declared CDC row (chunked changelog +
    * base snapshot) — the bench charges it here.
    */
  def prestage(spark: SparkSession, dir: String): Long = {
    stagedChangelogDir(spark, dir)
    baseStateDir(spark, dir)
    1L
  }

  /** Drive the apply loop: tail `stagedDir` one file per trigger and
    * maintain the (o_orderkey, cents) state table under
    * `stateRoot/v=<batchId>`, starting from `baseDir`. Exposed so the
    * crash-recovery spec can drive the SAME loop with an injected
    * failure.
    */
  private[graft] def runApply(spark: SparkSession, stagedDir: String,
      baseDir: String, stateRoot: String, ckpt: String,
      crashAt: Long = -1L,
      crashed: java.util.concurrent.atomic.AtomicBoolean = null): Unit = {
    val q = spark.readStream.schema(logSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val s = batch.sparkSession
        val prev = if (id == 0) baseDir else s"$stateRoot/v=${id - 1}"
        val slice = batch.localCheckpoint(true)
        val upserts = slice
          .filter(col("action").isin("update", "insert"))
          .select(col("o_orderkey"), col("new_cents").as("cents"))
        val dels = slice.filter(col("action") === "delete")
          .select(col("o_orderkey"))
        val next = graft.sources.Ingest.deleteByKey(
          graft.sources.Ingest.upsert(
            s.read.parquet(prev), upserts, "o_orderkey"),
          dels, "o_orderkey")
        next.write.mode("overwrite").parquet(s"$stateRoot/v=$id")
        if (crashAt >= 0 && id >= crashAt
            && crashed.compareAndSet(false, true))
          throw new RuntimeException("graft-injected-crash")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Summary of the last committed state version under `stateRoot`.
    * Output: (n_rows, total_cents).
    */
  private[graft] def endState(spark: SparkSession, stateRoot: String): DataFrame = {
    val last = new java.io.File(stateRoot).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).max
    spark.read.parquet(s"$stateRoot/v=$last")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("total_cents"))
  }

  /** The declared STREAMING-EXECUTED CDC apply
    * (`orders_cdc_apply_streamed`, the twenty-first streaming row):
    * tail the changelog, MERGE each chunk into the versioned state,
    * and summarize the final table alongside the per-action counts the
    * log itself carries. The oracle reconstructs the composed end
    * state relationally — a hash match proves the incremental
    * maintenance converged to exactly the batch MERGE's answer.
    * Output: (n_rows, n_updated, n_inserted, n_deleted, total_cents).
    */
  def applyChangelogStreamed(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedChangelogDir(spark, dir)
    val base = baseStateDir(spark, dir)
    val stateRoot = EventStream.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-cdc-state")).toString
    EventStream.withStreamPartitions(spark, 4, noData = false) {
      runApply(spark, staged, base, stateRoot,
        EventStream.ckptDir("graft-ckpt-cdc"))
    }
    val counts = graft.sources.Ingest.mergeChangelogShowcase(spark, dir)
      .groupBy()
      .agg(sum(when(col("action") === "update", 1L).otherwise(0L))
          .as("n_updated"),
        sum(when(col("action") === "insert", 1L).otherwise(0L))
          .as("n_inserted"),
        sum(when(col("action") === "delete", 1L).otherwise(0L))
          .as("n_deleted"))
    endState(spark, stateRoot).crossJoin(broadcast(counts))
      .select(col("n_rows"), col("n_updated"), col("n_inserted"),
        col("n_deleted"), col("total_cents"))
  }
}
