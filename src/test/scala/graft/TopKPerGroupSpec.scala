package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.knn.ExactKnn
import graft.plans.{GraftOps, TopKPerGroupExec}

class TopKPerGroupSpec extends SparkSpec {

  test("hand fixture: k rows per group, ranked, deterministic ties") {
    import spark.implicits._
    val df = Seq(
      ("a", 3.0, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L), ("a", 2.0, 4L),
      ("b", 5.0, 5L), ("b", 4.0, 6L))
      .toDF("g", "x", "id")
    val top = GraftOps.topKPerGroup(df, Seq("g"),
      Seq("x" -> true, "id" -> true), k = 2)
    val got = top.orderBy("g", "rk")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3)))
    // group a: (1.0,2) then (1.0,3) — tie broken by id; group b: 4 then 5
    assert(got.sameElements(Array(
      ("a", 2L, 1), ("a", 3L, 2), ("b", 6L, 1), ("b", 5L, 2))))
  }

  test("physical plan uses TopKPerGroupExec with a single shuffle") {
    val df = GraftOps.topKPerGroup(
      Tables.orders(spark, sf0001).join(
        broadcast(Tables.customer(spark, sf0001)),
        col("o_custkey") === col("c_custkey")),
      Seq("c_mktsegment"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 5)
    // unwrap AQE (AdaptiveSparkPlanExec has no children for collect)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: TopKPerGroupExec => e }.nonEmpty,
      s"no TopKPerGroupExec in:\n$plan")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.size == 1, s"expected 1 shuffle, got ${shuffles.size}")
    df.count() // executes fine end-to-end
  }

  test("partialFirst: same result, map-side prune feeds the shuffle") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"g${i % 5}", i.toDouble, i.toLong))
      .toDF("g", "x", "id").repartition(7)
    val plain = GraftOps.topKPerGroup(df, Seq("g"),
      Seq("x" -> false, "id" -> true), k = 4)
    val twoPhase = GraftOps.topKPerGroup(df, Seq("g"),
      Seq("x" -> false, "id" -> true), k = 4, partialFirst = true)
    assert(twoPhase.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(twoPhase).count() == 0)
    val plan = twoPhase.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val execs = plan.collect { case e: TopKPerGroupExec => e }
    assert(execs.exists(_.partial) && execs.exists(!_.partial),
      s"expected partial + final TopKPerGroupExec pair in:\n$plan")
    // the partial exec must run BELOW the clustering shuffle (map side);
    // ignore the test's own repartition(7) round-robin exchange
    val clustering = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(clustering.size == 1,
      s"expected 1 hash shuffle, got ${clustering.size}:\n$plan")
    assert(clustering.head.find {
      case e: TopKPerGroupExec => e.partial; case _ => false
    }.isDefined, s"partial exec not on the map side of the shuffle:\n$plan")
  }

  test("topOrdersPerSegment plans as heap top-k: no Sort, no Window") {
    val df = graft.operators.Relational.topOrdersPerSegment(spark, sf0001)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: TopKPerGroupExec => e }.size == 2,
      s"expected partial+final TopKPerGroupExec in:\n$plan")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"sort/window found in:\n$plan")
    assert(df.count() == 25) // 5 segments x 5
  }

  test("faceted kNN plans as heap top-k grouped by (qid, label)") {
    val df = graft.knn.ExactKnn.topKPerLabelBatch(spark, sf0001)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: TopKPerGroupExec => e }.nonEmpty,
      s"expected TopKPerGroupExec in:\n$plan")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"sort/window found in:\n$plan")
  }

  test("agrees with the window row_number form on the kNN workload") {
    val (base, queries, _, _) = ExactKnn.split(spark, sf0001)
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("emb").as("qvec")))
    val scored = base.crossJoin(q)
      .select(col("qid"), col("vec_id"),
        ExactKnn.dist(col("emb"), col("qvec")).as("dist"))
    val viaHeap = GraftOps.topKPerGroup(scored, Seq("qid"),
      Seq("dist" -> true, "vec_id" -> true), k = 10)
      .select("qid", "vec_id", "dist", "rk")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    val viaWindow = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).select("qid", "vec_id", "dist", "rk")
    assert(viaHeap.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaHeap).count() == 0)
  }
}
