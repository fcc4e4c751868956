package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the interaction graph implied by `events` —
  * training-corpus pipelines rank/score entities this way (domain
  * authority for crawl prioritization, user/item importance). The
  * reference has no graph surface (north-star extension alongside the
  * connected-components pass in [[Dedup.nearDupClusters]]).
  *
  * Scale notes: PageRank is the canonical iterative-shuffle workload.
  * The edge relation is normalized ONCE (transition probability
  * attached), cached, and re-joined each iteration — so each round is
  * exactly one shuffle-join + one aggregation on the rank frame, the
  * minimum Spark can do without Pregel-style mutable state. At 100 TB
  * the edge frame would be bucketed by `src` so the per-iteration join
  * co-locates with the rank frame and only ranks (node, double) ever
  * re-shuffle. Iteration count is fixed (power iteration converges
  * geometrically; 3 rounds for the declared query keeps the oracle a
  * finite SQL chain).
  */
object GraphOps {

  /** Weighted PageRank over the bipartite user <-> event_type graph.
    *
    * Nodes are `u:<user_id>` and `t:<event_type>`; each distinct
    * (user, type) pair contributes a directed edge in both directions
    * weighted by its event count. Transition probability = w / out-
    * weight(src). Rank update: `r' = (1-d)/N + d * sum(r_src * p)`.
    *
    * Determinism (SURVEY.md §7.4): ranks are quantized to 9 dp after
    * every iteration so cross-engine fold-order ulps cannot accumulate,
    * and the declared output rounds once more to 6 dp.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val und = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("w"))
    val edges = und.select(
        concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("t:"), col("event_type")).as("dst"), col("w"))
      .unionAll(und.select(
        concat(lit("t:"), col("event_type")).as("src"),
        concat(lit("u:"), col("user_id")).as("dst"), col("w")))
    // transition probabilities, built once and reused every iteration
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("outw")).as("p"))
      .cache()
    val nodes = edges.select(col("src").as("node")).distinct().cache()
    // one driver-side scalar (node count) — not a data collect
    val n = nodes.count().toDouble

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    (1 to iters).foreach { _ =>
      val inflow = trans.join(ranks, trans("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("p")).as("inflow"))
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0)), 9).as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
