package graft

import org.apache.spark.sql.functions._

import graft.functions.{HilbertCurve, HilbertImpl}
import graft.operators.ScaleTechniques

/** Pins the Hilbert kernel to the curve's DEFINING properties — the
  * checks that distinguish a genuine Hilbert traversal from any other
  * bijective bit-mix (Z-order fails the adjacency check at every
  * quadrant boundary):
  *   1. bijection: index() is a permutation of the full grid;
  *   2. adjacency: consecutive indices are Manhattan-distance-1 grid
  *      neighbors — the locality property the layout rows monetize;
  *   3. round trip with the inverse transform;
  *   4. the codegen Expression path agrees with the static kernel
  *      (same bit-exact values through whole-stage codegen).
  */
class HilbertSpec extends SparkSpec {

  test("hilbert index is a bijection with unit-step adjacency (order 4, " +
      "exhaustive) and round-trips through the inverse") {
    val bits = 4
    val n = 1 << bits
    val seen = new Array[Boolean](n * n)
    val xs = new Array[Long](n * n)
    val ys = new Array[Long](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertImpl.index(x.toLong, y.toLong, bits)
      assert(d >= 0 && d < n * n, s"index out of range: ($x,$y) -> $d")
      assert(!seen(d.toInt), s"collision at d=$d")
      seen(d.toInt) = true
      xs(d.toInt) = x.toLong
      ys(d.toInt) = y.toLong
      val (ix, iy) = HilbertImpl.position(d, bits)
      assert(ix == x && iy == y,
        s"round trip broke: ($x,$y) -> $d -> ($ix,$iy)")
    }
    // every consecutive pair along the curve is a grid neighbor — the
    // property Z-order lacks (its quadrant jumps have distance > 1)
    (1 until n * n).foreach { d =>
      val step = math.abs(xs(d) - xs(d - 1)) + math.abs(ys(d) - ys(d - 1))
      assert(step == 1L, s"d=${d - 1}->$d jumps ($step) — not a Hilbert walk")
    }
    // contrast: the Morton order DOES jump (sanity that the check bites)
    val mx = new Array[Int](n * n)
    val my = new Array[Int](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = mortonOf(x, y, bits).toInt
      mx(d) = x; my(d) = y
    }
    val mortonJumps = (1 until n * n).count { d =>
      math.abs(mx(d) - mx(d - 1)) + math.abs(my(d) - my(d - 1)) > 1
    }
    assert(mortonJumps > 0, "morton contrast check is vacuous")
  }

  private def mortonOf(x: Int, y: Int, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x.toLong & (1L << i)) << i) | ((y.toLong & (1L << i)) << (i + 1))
    }

  test("the codegen Expression path matches the static kernel bit-exactly") {
    val bits = 8
    val df = spark.range(4096).select(
      (col("id") % 256).as("x"),
      ((col("id") / 16).cast("long") % 256).as("y"))
    val got = df.select(col("x"), col("y"),
        HilbertCurve.hilbertIndex(col("x"), col("y"), bits).as("h"))
      .collect()
    got.foreach { r =>
      val want = HilbertImpl.index(r.getLong(0), r.getLong(1), bits)
      assert(r.getLong(2) == want,
        s"codegen disagrees at (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("hilbert tiles partition the events table: bucket counts sum to " +
      "the row count and each row lands in exactly one tile") {
    val stats = ScaleTechniques.hilbertBucketStats(spark, sf0001)
    val total = stats.agg(sum(col("n"))).collect().head.getLong(0)
    val rows = Tables.events(spark, sf0001).count()
    assert(total == rows, s"tile counts $total != table rows $rows")
    // granularity matches the zorder sibling: same tile id space
    val nTiles = stats.count()
    assert(nTiles >= 1 && nTiles <= (1L << (2 * 8 - 10)))
  }
}
