package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAMING CDC APPLY — the consumption half of the MERGE contract
  * ([[graft.sources.Ingest.mergeChangelogShowcase]] produces the
  * changelog; a real lakehouse also has a process that TAILS that
  * changelog and maintains the downstream table incrementally). The
  * file stream source tails the staged changelog one chunk per
  * micro-batch; each batch MERGEs its slice into a BUCKETED versioned
  * state table inside `foreachBatch`.
  *
  * State layout (the scale fix over the r10 full-table rewrite): the
  * table lives hash-bucketed by `pmod(o_orderkey, NStateBuckets)`;
  * version directory `v=<batchId>` holds ONLY the buckets that batch's
  * changes touch (`bucket=<b>` hive dirs), and "the table as of v" is,
  * per bucket, the newest `bucket=<b>` dir with version <= v (falling
  * back to the bucketed base snapshot). A micro-batch therefore
  * costs one |batch|-bounded join against the TOUCHED buckets' scan
  * plus a rewrite of exactly those buckets — O(changes x bucket
  * granularity) per trigger, never O(|table|): with 100 TB of state in
  * 100k buckets, a trigger touching 50 keys rewrites ~50 bucket files,
  * not the table. This is precisely `partitionOverwriteMode=dynamic`'s
  * contract, expressed with explicit per-version directories so the
  * crash discipline below stays inspectable.
  *
  * Crash discipline (exactly-once, proven by CrashRecoverySpec): a
  * replayed batch re-resolves its inputs as "newest version STRICTLY
  * BELOW my id" — a partially-written `v=<id>` from a crash is never
  * read, and `mode(overwrite)` truncates it before the rewrite, so the
  * restart converges to the identical state byte-for-byte.
  * CdcBucketSpec pins the write-amplification claim structurally: a
  * batch touching k buckets writes exactly k bucket dirs under its
  * version, and untouched buckets' files are not rewritten.
  */
object CdcStream {

  /** State-table bucket count. Sized so the sf fixtures exercise
    * multi-bucket versions while each chunk still leaves most buckets
    * untouched; at 100 TB this is the knob that sets write
    * amplification (buckets ~ |table| / target-file-size).
    */
  private[graft] val NStateBuckets = 16

  private val logSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("action", StringType),
    StructField("old_cents", LongType),
    StructField("new_cents", LongType)))

  /** Stage the deterministic changelog as `nChunks` single-file chunks
    * (keyed by pmod(o_orderkey, nChunks) — each key carries exactly one
    * action, so chunk order can never matter). Memoized per
    * (dataset, nChunks).
    */
  private def stagedChangelogDir(spark: SparkSession, dir: String,
      nChunks: Int = 4): String =
    graft.IndexCache.getOrBuild(spark, s"orders-cdc-dir:$dir:$nChunks") {
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

  /** The initial (o_orderkey, cents) state rendered once per dataset,
    * hash-bucketed like every later version (`bucket=<b>` dirs) — a
    * one-time export like the stream stagings, charged to
    * `bench_build_cdc_stage` so the declared row measures the apply
    * loop, not the base snapshot.
    */
  private def baseStateDir(spark: SparkSession, dir: String): String =
    graft.IndexCache.getOrBuild(spark,
        s"orders-cdc-base:$dir:$NStateBuckets") {
      val base = EventStream.cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft-cdc-base")).toString
      graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          pmod(col("o_orderkey"), lit(NStateBuckets)).as("bucket"))
        .write.partitionBy("bucket").mode("overwrite").parquet(base)
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

  /** The newest version < `beforeV` that wrote `bucket`, or -1 for
    * "only the base snapshot has it". Driver-side directory listing
    * over <= |versions| names — O(1) metadata, the in-miniature form
    * of a lakehouse transaction-log lookup.
    */
  private def latestVersionFor(stateRoot: String, bucket: Int,
      beforeV: Long): Long = {
    val root = new java.io.File(stateRoot)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < beforeV)
    versions.sorted(Ordering[Long].reverse)
      .find(v => new java.io.File(s"$stateRoot/v=$v/bucket=$bucket").exists())
      .getOrElse(-1L)
  }

  /** The state as of version `beforeV - 1` restricted to `buckets`:
    * per bucket, read its newest writer's directory. Paths only —
    * the data never routes through the driver.
    */
  private def stateAt(spark: SparkSession, stateRoot: String,
      baseDir: String, buckets: Seq[Int], beforeV: Long): DataFrame = {
    val paths = buckets.map { b =>
      latestVersionFor(stateRoot, b, beforeV) match {
        case -1L => s"$baseDir/bucket=$b"
        case v => s"$stateRoot/v=$v/bucket=$b"
      }
    }
    spark.read.parquet(paths: _*)
  }

  /** Drive the apply loop: tail `stagedDir` one file per trigger and
    * maintain the bucketed (o_orderkey, cents) state table under
    * `stateRoot/v=<batchId>/bucket=<b>`, starting from the bucketed
    * snapshot at `baseDir`. Exposed so the crash-recovery spec can
    * drive the SAME loop with an injected failure.
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
        val slice = batch.localCheckpoint(true)
        // the batch's touched buckets — a bounded collect (<= the
        // NStateBuckets constant, never data-sized)
        val touched = slice
          .select(pmod(col("o_orderkey"), lit(NStateBuckets)).cast("int"))
          .distinct().collect().map(_.getInt(0)).sorted
        if (touched.nonEmpty) {
          val prev = stateAt(s, stateRoot, baseDir, touched.toSeq, id)
          val upserts = slice
            .filter(col("action").isin("update", "insert"))
            .select(col("o_orderkey"), col("new_cents").as("cents"))
          val dels = slice.filter(col("action") === "delete")
            .select(col("o_orderkey"))
          // every slice key lands in a touched bucket by construction,
          // so merging only those buckets is the complete merge
          val next = graft.sources.Ingest.deleteByKey(
            graft.sources.Ingest.upsert(prev, upserts, "o_orderkey"),
            dels, "o_orderkey")
          next
            .withColumn("bucket",
              pmod(col("o_orderkey"), lit(NStateBuckets)))
            .write.partitionBy("bucket").mode("overwrite")
            .parquet(s"$stateRoot/v=$id")
        }
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

  /** Summary of the final state under `stateRoot` (per bucket, its
    * newest writer; base snapshot for never-touched buckets).
    * Output: (n_rows, total_cents).
    */
  private[graft] def endState(spark: SparkSession, stateRoot: String,
      baseDir: String): DataFrame =
    stateAt(spark, stateRoot, baseDir, 0 until NStateBuckets, Long.MaxValue)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("total_cents"))

  /** The declared STREAMING-EXECUTED CDC apply
    * (`orders_cdc_apply_streamed`, the twenty-first streaming row):
    * tail the changelog, MERGE each chunk into the bucketed versioned
    * state, and summarize the final table alongside the per-action
    * counts the log itself carries. The oracle reconstructs the
    * composed end state relationally — a hash match proves the
    * incremental maintenance converged to exactly the batch MERGE's
    * answer. Output: (n_rows, n_updated, n_inserted, n_deleted,
    * total_cents).
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
    endState(spark, stateRoot, base).crossJoin(broadcast(counts))
      .select(col("n_rows"), col("n_updated"), col("n_inserted"),
        col("n_deleted"), col("total_cents"))
  }
}
