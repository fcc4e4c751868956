package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a deliberately skewed key, adaptive
  * execution splits the oversized partition at runtime (skew=true on
  * the sort-merge join) — the config-driven complement to manual
  * salting (ScaleTechniques).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE marks and splits the skewed join partition") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the fixture-scale skew triggers the split
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of left rows share one key -> one fat partition
      val left = (1 to 50000).map(i =>
        (if (i % 10 == 0) i.toLong else 7L, s"payload-$i-${"x" * 20}"))
        .toDF("k", "payload")
      val right = (1 to 2000).map(i => (i.toLong, i * 2)).toDF("k", "v")
      val joined = left.join(right, "k")
      // execute THIS plan (count() would build a different query) so
      // AQE finalizes it with runtime stats
      joined.collect()
      // query-stage wrappers hide children from collect(); assert on the
      // rendered final plan instead
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"skew split not applied:\n$plan")
      assert(plan.contains("AQEShuffleRead coalesced and skewed"), plan)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
