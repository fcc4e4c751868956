package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingStats

class EmbeddingStatsSpec extends SparkSpec {

  test("centroid distances match a driver-side quantized recomputation") {
    val q = 1000000L
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val dims = rows.head._2.length
    val cents = rows.groupBy(_._1).map { case (lbl, g) =>
      lbl -> Array.tabulate(dims) { d =>
        // quantize-then-sum: exact integer arithmetic, like the query
        val s = g.map(r => math.round(r._2(d) * q)).sum
        s.toDouble / (g.length * q)
      }
    }
    val labels = cents.keys.toSeq.sorted
    val expect = (for {
      a <- labels; b <- labels if a < b
    } yield {
      val d = math.sqrt((0 until dims).map { i =>
        val x = cents(a)(i) - cents(b)(i); x * x
      }.sum)
      (a, b) -> BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }).toMap
    val got = EmbeddingStats.centroidDistances(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expect(k)) < 1e-9, s"$k: $v vs ${expect(k)}")
    }
    // separation sanity: all distances strictly positive
    assert(got.values.forall(_ > 0))
  }
}
