package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum._

/** Declarative data-quality EXPECTATIONS (the Deequ / Great
  * Expectations surface): a suite of named checks — completeness,
  * uniqueness, value ranges, domain membership, referential
  * integrity — evaluated against the warehouse tables in bulk, each
  * reporting the exact violation count and a pass flag. This is the
  * release gate a lakehouse runs on every new data drop, one step
  * before [[Profiling]]'s open-ended statistics.
  *
  * Scale shape: every per-table check family is a CONDITIONAL SUM
  * inside ONE aggregate scan of that table (violations are counted,
  * never collected — adding a check costs one column expression, not
  * a pass); uniqueness is a two-phase distinct count in the same
  * scan-set; referential integrity is one anti-join COUNT per edge
  * (dimension side broadcast where it fits, co-partitioned equi-join
  * where it doesn't). Output rows are |checks|-sized regardless of
  * data volume.
  */
object Expectations {

  private def row(check: String, nChecked: Column, nViolations: Column) =
    Seq(lit(check).as("check"), nChecked.cast("long").as("n_checked"),
      nViolations.cast("long").as("n_violations"))

  /** The declared suite over orders / lineitem / customer: one row per
    * check — (check, n_checked, n_violations, passed). Deterministic
    * pure-integer counting; the DuckDB oracle replays every check.
    */
  def suite(spark: SparkSession, dir: String): DataFrame =
    suiteOf(Tables.orders(spark, dir), Tables.lineitem(spark, dir),
      Tables.customer(spark, dir))

  /** The checks over arbitrary tables with the TPC-H shapes — exposed
    * so ExpectationsSpec can prove violations are actually COUNTED on
    * a deliberately corrupted synthetic (the fixture passes every
    * check, which alone would be a vacuous green).
    */
  private[graft] def suiteOf(o: DataFrame, l: DataFrame,
      c: DataFrame): DataFrame = {

    // orders: one scan, four families of conditional sums + one
    // distinct count (Catalyst plans the single-distinct as a plain
    // two-phase dedupe alongside the partial-agged sums)
    val ordersChecks = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      countDistinct(col("o_orderkey")).as("dk"),
      sum(when(cents(col("o_totalprice")) <= 0L, 1L).otherwise(0L))
        .as("nonpos_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
      .select(
        struct(row("orders.o_custkey complete",
          col("n"), col("null_cust")): _*).as("c1"),
        struct(row("orders.o_orderkey unique",
          col("n"), col("n") - col("dk")): _*).as("c2"),
        struct(row("orders.o_totalprice positive",
          col("n"), col("nonpos_price")): _*).as("c3"),
        struct(row("orders.o_orderstatus in (O,F,P)",
          col("n"), col("bad_status")): _*).as("c4"))
      .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4")))
        .as("r"))
      .select(col("r.*"))

    // lineitem: one scan — ranges and the (orderkey, linenumber)
    // compound-key uniqueness
    val lineChecks = l.agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("dk"),
      sum(when(cents(col("l_quantity")) <= 0L, 1L).otherwise(0L))
        .as("nonpos_qty"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5, 1L)
        .otherwise(0L)).as("bad_disc"))
      .select(
        struct(row("lineitem.(l_orderkey,l_linenumber) unique",
          col("n"), col("n") - col("dk")): _*).as("c1"),
        struct(row("lineitem.l_quantity positive",
          col("n"), col("nonpos_qty")): _*).as("c2"),
        struct(row("lineitem.l_discount in [0,0.5]",
          col("n"), col("bad_disc")): _*).as("c3"))
      .select(explode(array(col("c1"), col("c2"), col("c3"))).as("r"))
      .select(col("r.*"))

    // referential edges: orphan counts via anti-join (customer is a
    // broadcastable dimension; orders-side of the lineitem edge is a
    // co-partitioned equi-join at scale)
    // NULL keys are completeness failures, not orphans — exclude them
    // here (matches SQL NOT IN semantics, where NULL rows drop out)
    val orphanOrders = o.filter(col("o_custkey").isNotNull).join(
        broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .crossJoin(o.agg(count(lit(1)).as("n")))
      .select(row("orders.o_custkey -> customer", col("n"), col("v")): _*)
    val orphanLines = l.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .crossJoin(l.agg(count(lit(1)).as("n")))
      .select(row("lineitem.l_orderkey -> orders", col("n"), col("v")): _*)

    ordersChecks.unionByName(lineChecks)
      .unionByName(orphanOrders).unionByName(orphanLines)
      .withColumn("passed",
        when(col("n_violations") === 0L, 1).otherwise(0))
  }

  /** Compound-key uniqueness with PINNED NULL semantics — the round-7
    * carried gap: Spark's `countDistinct(a, b)` silently drops any
    * tuple with a NULL component while DuckDB's `count(DISTINCT
    * (a, b))` counts row-tuples (NULL is a value), so the two engines
    * disagree the moment a key column goes NULL and the fixture (being
    * NULL-free) never exercised the difference. This check REMOVES the
    * ambiguity instead of picking an engine's default: NULL-component
    * rows are counted out EXPLICITLY as their own metric
    * (`n_nullkey_rows` — completeness failures, the suite's standing
    * rule) and uniqueness is evaluated over the non-NULL remainder
    * only, a definition both engines express identically.
    *
    * The declared row derives a deliberately NULL-BEARING compound key
    * from lineitem (`nullif(l_orderkey % 1000, 0)`,
    * `nullif(l_linenumber, 7)`) so every metric is non-trivially
    * exercised at any SF. One aggregate scan; |1| output row.
    */
  def nullKeyUniqueness(spark: SparkSession, dir: String): DataFrame =
    nullKeyUniquenessOf(Tables.lineitem(spark, dir)
      .select(nullif(col("l_orderkey") % 1000L, lit(0L)).as("k1"),
        nullif(col("l_linenumber"), lit(7)).as("k2")))

  /** Functional-dependency AUDIT (the profiling step of FD discovery,
    * Huhtala et al. 1999 TANE — here the candidate set is declared, the
    * engine measures): for each candidate `lhs -> rhs`, how many lhs
    * groups exist, how many carry MORE than one distinct rhs (the FD
    * violation witness), and how many rows sit inside violating groups
    * — the exact evidence a schema-inference / data-contract layer
    * needs before promoting a column pair to an invariant. A key-borne
    * FD (`n_nationkey -> n_regionkey`) anchors the holds=1 case; the
    * rest probe real dependency strength at every rate.
    *
    * Scale shape: ONE partial-aggregated rollup per candidate on its
    * own table (groupBy lhs, countDistinct rhs — two-phase, map-side
    * combined), then a |groups|-row second fold to the 1-row audit;
    * candidates on the same table still scan independently (Catalyst
    * shares nothing across the union legs, but each leg is the minimal
    * two-column projection — the scan reads only lhs+rhs thanks to
    * column pruning). Output: one row per candidate FD.
    */
  def fdViolations(spark: SparkSession, dir: String): DataFrame = {
    val cands = Seq(
      (Tables.nation(spark, dir), "nation", "n_nationkey", "n_regionkey"),
      (Tables.part(spark, dir), "part", "p_brand", "p_type"),
      (Tables.customer(spark, dir), "customer", "c_nationkey",
        "c_mktsegment"),
      (Tables.orders(spark, dir), "orders", "o_custkey", "o_orderpriority"),
      (Tables.orders(spark, dir), "orders", "o_orderdate", "o_orderstatus"),
      (Tables.lineitem(spark, dir), "lineitem", "l_orderkey", "l_shipdate"))
    cands.map { case (df, t, lhs, rhs) => fdAuditOf(df, t, lhs, rhs) }
      .reduce(_ unionByName _)
  }

  private[graft] def fdAuditOf(df: DataFrame, table: String, lhs: String,
      rhs: String): DataFrame =
    df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("d"),
        count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("c")).as("n_rows"),
        sum(when(col("d") > 1, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("d") > 1, col("c")).otherwise(0L))
          .as("n_violating_rows"))
      .select(lit(s"$table.$lhs -> $rhs").as("fd"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_groups").cast("long").as("n_groups"),
        col("n_violating_groups").cast("long").as("n_violating_groups"),
        col("n_violating_rows").cast("long").as("n_violating_rows"),
        when(col("n_violating_groups") === 0L, 1).otherwise(0).as("holds"))

  private[graft] def nullKeyUniquenessOf(keys: DataFrame): DataFrame = {
    val nonNull = col("k1").isNotNull && col("k2").isNotNull
    keys.agg(
      count(lit(1)).as("n"),
      sum(when(!nonNull, 1L).otherwise(0L)).as("nullRows"),
      countDistinct(when(nonNull, struct(col("k1"), col("k2"))))
        .as("dk"))
      .select(lit("lineitem.(k1,k2) unique among non-NULL").as("check"),
        col("n").cast("long").as("n_rows"),
        col("nullRows").cast("long").as("n_nullkey_rows"),
        (col("n") - col("nullRows")).cast("long").as("n_nonnull_rows"),
        col("dk").cast("long").as("n_distinct_keys"),
        (col("n") - col("nullRows") - col("dk")).cast("long")
          .as("n_duplicates"))
      .withColumn("passed",
        when(col("n_duplicates") === 0L && col("n_nullkey_rows") === 0L, 1)
          .otherwise(0))
  }
}
