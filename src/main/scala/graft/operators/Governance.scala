package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance operators — the release-gate checks a corpus or an
  * aggregate table passes before leaving the pipeline (the reference
  * has no governance surface; north-star extension like the profiling
  * suite). Both follow the exact-arithmetic discipline: integer
  * counting end-to-end, and where the DP mechanism needs randomness it
  * derives a DETERMINISTIC uniform from the repo's cross-engine
  * polynomial hash, so the oracle replays the identical release.
  */
object Governance {

  /** k-anonymity audit of the (market segment, nation) quasi-identifier
    * over customers: how many equivalence classes fall below `k`, and
    * how many ROWS sit in those re-identifiable classes — the check a
    * privacy review runs before any per-group table is published.
    * One rollup + one summary aggregate; pure integers (risk as
    * integer permille). Output: 1 row.
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val groups = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("sz"))
    groups.agg(
        sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("sz")).as("min_group_size"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("groups_below_k"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_below_k"))
      .select(col("n_rows"), col("n_groups"), col("min_group_size"),
        col("groups_below_k"), col("rows_below_k"),
        expr("rows_below_k * 1000 div n_rows").as("risk_permille"))
  }

  /** Laplace-mechanism noisy counts per event type (ε = 1.0) — the
    * differential-privacy release shape, with the mechanism's draw
    * made DETERMINISTIC for the oracle gate: u derives from the
    * cross-engine polynomial hash of the group key (a fixed salt), and
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) is the exact Laplace
    * inverse-CDF. A production release would draw u from a CSPRNG —
    * this pins the MECHANISM (sensitivity-1 count + Laplace(1/ε)),
    * which is the part an engine owns; it also publishes the true
    * count side by side because the fixture is not a real release
    * (documented, not an oversight). Map-only over the |types|-row
    * rollup. Output: (event_type, n_true, epsilon, noisy_count).
    */
  /** l-diversity audit — k-anonymity's companion: a quasi-identifier
    * class can be large (k-anonymous) yet still leak its SENSITIVE
    * attribute if every member shares one value. Per (mktsegment,
    * nation) class: size, the number of DISTINCT sensitive values
    * (account-balance sign band as the sensitive attribute), the
    * dominant value's share in integer permille, and the l<2 flag
    * (a homogeneous class — the attribute is disclosed for every
    * member). One rollup over (class, sensitive) then one over class;
    * pure integers. Output: (mktsegment, nation, sz, l_distinct,
    * top_share_permille, homogeneous).
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val sensitive = when(col("c_acctbal") < 0, "debt")
      .when(col("c_acctbal") < 5000, "mid").otherwise("high")
    val cells = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("mktsegment"),
        col("n_name").as("nation"), sensitive.as("s"))
      .groupBy(col("mktsegment"), col("nation"), col("s"))
      .agg(count(lit(1)).as("n"))
    cells.groupBy(col("mktsegment"), col("nation"))
      .agg(sum(col("n")).as("sz"),
        count(lit(1)).as("l_distinct"),
        max(col("n")).as("top"))
      .select(col("mktsegment"), col("nation"), col("sz"),
        col("l_distinct"),
        expr("top * 1000 div sz").as("top_share_permille"),
        when(col("l_distinct") < 2, 1).otherwise(0).as("homogeneous"))
  }

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymity]] (class size) and [[lDiversity]] (sensitive-value
    * count): a class can be large AND diverse yet still leak if its
    * sensitive-value DISTRIBUTION sits far from the corpus marginal
    * (e.g. a class that is 90% "debt" against a 10% baseline discloses
    * by proportion). Per (mktsegment, nation) class: the Earth Mover's
    * Distance between the class distribution and the corpus marginal
    * over the ORDERED 3-band account-balance attribute (debt < mid <
    * high) — for an ordered attribute with m levels,
    * EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j − q_j)| (Li et al. 2007).
    *
    * Exactness: cumulative-band counts cross-multiply against the
    * corpus totals so every |·| term is the integer
    * |cum_i·N − T_i·sz| over the common denominator sz·N; t reports in
    * integer permille via one exact integral division. DECIMAL(38,0)
    * intermediates (HUGEINT in the oracle) keep the cross-products
    * exact at any N.
    *
    * Scale shape: one rollup over the broadcast-joined customer
    * relation (cumulative band sums as conditional counts — no second
    * pass), corpus totals as a broadcast 1-row fold OF THE ROLLUP, one
    * map-only projection. Output: (mktsegment, nation, sz,
    * t_permille) — |classes| rows.
    */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val band = when(col("c_acctbal") < 0, 0)
      .when(col("c_acctbal") < 5000, 1).otherwise(2)
    val cells = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("mktsegment"),
        col("n_name").as("nation"), band.as("s"))
      .groupBy(col("mktsegment"), col("nation"))
      .agg(count(lit(1)).as("sz"),
        sum(when(col("s") <= 0, 1L).otherwise(0L)).as("cum1"),
        sum(when(col("s") <= 1, 1L).otherwise(0L)).as("cum2"))
    val tot = cells.agg(sum(col("sz")).as("n"),
      sum(col("cum1")).as("t1"), sum(col("cum2")).as("t2"))
    cells.crossJoin(broadcast(tot))
      .select(col("mktsegment"), col("nation"), col("sz"),
        expr("""CAST((abs(CAST(cum1 AS DECIMAL(38,0)) * n - CAST(t1 AS DECIMAL(38,0)) * sz)
                    + abs(CAST(cum2 AS DECIMAL(38,0)) * n - CAST(t2 AS DECIMAL(38,0)) * sz))
                   * 1000 div (2 * CAST(sz AS DECIMAL(38,0)) * n) AS BIGINT)""")
          .as("t_permille"))
  }

  /** Keyed pseudonymization of the user identifier — the
    * join-preserving de-identification step between raw ids and DP
    * aggregates: token = sha256(key ‖ user_id), so the same user maps
    * to the same token everywhere (joins, sessionization, and distinct
    * counts keep working on the pseudonymized table) while the mapping
    * is one-way without the key. Output: the top-`perType` most active
    * users per event type with their token prefix — which pins the
    * MAPPING itself under the hash gate, not just its cardinality —
    * plus each type's (distinct users == distinct tokens) injectivity
    * audit columns.
    *
    * Scale shape: token derivation is a map-only codegen'd expression
    * (sha2 over concat — no UDF); the per-type rollups are
    * partial-aggregated; the top-k cut is the bounded-heap operator.
    * At 100 TB the key lives in a KMS and arrives as a secret literal
    * per job — the plan is identical.
    */
  def pseudonymizeUsers(spark: SparkSession, dir: String,
      key: String = "graft-pseu-k1", perType: Int = 3): DataFrame = {
    val token = sha2(concat(lit(key), lit(":"),
      col("user_id").cast("string")), 256)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), token.as("tok"))
    val audit = base.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("tok")).as("n_tokens"))
    val top = graft.plans.GraftOps.topKPerGroup(
      base.groupBy(col("event_type"), col("user_id"), col("tok"))
        .agg(count(lit(1)).as("n_events")),
      Seq("event_type"),
      Seq("n_events" -> false, "user_id" -> true), perType)
    top.join(broadcast(audit), Seq("event_type"))
      .select(col("event_type"), col("user_id"),
        substring(col("tok"), 1, 16).as("token16"),
        col("n_events"), col("n_users"), col("n_tokens"))
  }

  def dpEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val u = ((TextOps.polyHash(concat(col("event_type"), lit(":dp1")))
      .cast("double") + 1.0) / 1000000009.0).as("u")
    cnt.select(col("event_type"), col("n"), u)
      .select(col("event_type"), col("n").as("n_true"),
        lit(1.0).as("epsilon"),
        round(col("n").cast("double") +
          lit(-1.0) * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 6)
          .as("noisy_count"))
  }
}
