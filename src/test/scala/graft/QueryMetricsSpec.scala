package graft

import org.apache.spark.sql.functions._

/** Quantitative proof of the plan-shape claims: the instrumentation
  * measures what actually crossed the shuffle, not what the plan text
  * promises.
  *
  * (A finding worth recording: Spark 4's own `WindowGroupLimit`
  * already prunes the row_number<=k idiom BELOW the shuffle, so the
  * naive window form is no longer a fact-table shuffle — the
  * RewriteWindowTopK rule's remaining win over it is eliminating the
  * two per-partition sorts, not shuffle volume. The contrast measured
  * here is therefore within our own operator: single-phase vs
  * two-phase TopKPerGroup.)
  */
class QueryMetricsSpec extends SparkSpec {

  test("two-phase bounded-heap top-k shuffles candidates, not the fact table") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value"))
    val n = events.count()

    def run(partialFirst: Boolean): QueryMetrics.Metrics =
      QueryMetrics.measure(spark) {
        graft.plans.GraftOps.topKPerGroup(events, Seq("event_type"),
          Seq("value" -> false, "event_id" -> true), 5,
          partialFirst = partialFirst).count()
      }
    val single = run(partialFirst = false)
    val twoPhase = run(partialFirst = true)

    // single-phase clusters the whole fact table on the group key...
    assert(single.shuffleRecordsWritten >= n,
      s"single-phase wrote ${single.shuffleRecordsWritten} < $n")
    // ...two-phase ships <= partitions x groups x k survivors
    assert(twoPhase.shuffleRecordsWritten * 10 < single.shuffleRecordsWritten,
      s"two-phase ${twoPhase.shuffleRecordsWritten} vs " +
        s"single ${single.shuffleRecordsWritten}")
  }

  test("map-only plans shuffle only the count's partial rows") {
    val m = QueryMetrics.measure(spark) {
      graft.operators.Pipeline.trainValTest(spark, sf0001).count()
    }
    // count() itself ships one partial row per input partition; the
    // split assignment must add nothing
    assert(m.shuffleRecordsWritten <= 8, m.toString)
    assert(m.inputRecords > 0)
  }

  test("BFS hops shuffle frontiers, not the edge list, once the " +
      "adjacency is staged") {
    // stage adjacency + warm one full run (IndexCache) OUTSIDE the
    // measured window — the claim is about the per-query cost after
    // the one-time build, which the bench charges to its build row
    val edges2 = graft.operators.GraphOps.bidirAdjacency(spark, sf0001)
    val edgeRows = edges2.count()
    graft.operators.GraphOps.shortestPaths(spark, sf0001).count()
    val m = QueryMetrics.measure(spark) {
      graft.operators.GraphOps.shortestPaths(spark, sf0001).count()
    }
    // 4 hops against an |E|-row adjacency: if any hop re-shuffled the
    // edge list the total would exceed 4x|E|; the staged-partitioning
    // claim is that only frontiers, merges, and count partials move
    assert(m.shuffleRecordsWritten < edgeRows,
      s"BFS shuffled ${m.shuffleRecordsWritten} rows >= edge list " +
        s"$edgeRows — the adjacency is moving per hop")
  }
}
