package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed Aggregator — the frequency twin of the
  * [[KmvDistinct]] distinct sketch: a `depth x width` grid of counters;
  * every key increments one counter per row (seeded pairwise hashes),
  * and a key's frequency estimate is the MIN of its `depth` counters —
  * always an overestimate, within eps*N with probability 1-delta for
  * width = e/eps, depth = ln(1/delta).
  *
  * Why it matters at 100 TB: exact per-key counts of a high-cardinality
  * column are a full shuffle of every key; the sketch is a constant
  * `depth*width*8` bytes per partition, merged by elementwise ADDITION
  * (commutative/associative, so partial aggregation works and the
  * result is bit-deterministic regardless of partitioning or merge
  * order). Pair it with a small candidate-key relation and heavy
  * hitters come out of one broadcast probe pass.
  *
  * Hash family: h_i(x) = ((a_i*x + b_i) mod P) mod width with seeded
  * odd multipliers mod the Mersenne prime P = 2^31-1 — the same
  * portable-and-reproducible discipline as the MinHash permutations
  * (graft.operators.Dedup).
  */
case class CountMin(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  import CountMin.MersennePrime

  private val (hashA, hashB): (Array[Long], Array[Long]) = {
    val rng = new java.util.Random(20260814L)
    def draw(lo: Long): Array[Long] =
      Array.fill(depth)(lo + math.floorMod(rng.nextLong(), MersennePrime - lo))
    (draw(1L), draw(0L))
  }

  /** The counter slot of key `x` in sketch row `i`. */
  def slot(i: Int, x: Long): Int = {
    val h = math.floorMod(x, MersennePrime)
    (math.floorMod(hashA(i) * h + hashB(i), MersennePrime) % width).toInt
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < depth) { b(i * width + slot(i, x)) += 1L; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  /** Point query against a materialized sketch. */
  def estimate(sketch: Array[Long], x: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + slot(i, x))
      if (c < best) best = c
      i += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  val MersennePrime = 2147483647L // 2^31 - 1
}
