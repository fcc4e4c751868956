package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the "novel sketch" custom aggregate: keep the k smallest distinct
  * hash values seen; if fewer than k exist the count is exact, otherwise
  * estimate D ~ (k-1) * P / h_k (hashes uniform on [0, P)).
  *
  * Feed it PORTABLE hashes (graft.operators.TextOps.polyHash — a
  * code-point fold mod P) and the sketch is deterministic and
  * reproducible in the DuckDB oracle, unlike HLL-based
  * approx_count_distinct. Buffers are sorted arrays of at most k longs:
  * mergeable (the whole point of a sketch — partial aggregation works),
  * tiny (k*8 bytes), and exact at low cardinality.
  */
case class KmvDistinct(k: Int, p: Long = 1000000007L)
    extends Aggregator[Long, Array[Long], Double] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) b // already present
    else {
      val ins = -idx - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins >= k) b // larger than the current k-th minimum
      else {
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(reduce)

  override def finish(b: Array[Long]): Double =
    if (b.length < k) b.length.toDouble
    else (k - 1).toDouble * p / b(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The same KMV reduction, finishing with the SKETCH itself (the sorted
  * k smallest distinct hashes) instead of the scalar estimate — the form
  * set ALGEBRA needs: two groups' sketches combine into their union's
  * sketch (merge), and the Beyer et al. (2007) ρ-estimator reads the
  * intersection off the combined sketch ([[graft.operators.TextOps
  * .kmvSourceOverlap]]). One |groups| × k-long matrix leaves the
  * executors — never the value sets.
  */
case class KmvSketch(k: Int, p: Long = 1000000007L)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val inner = KmvDistinct(k, p)

  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], h: Long): Array[Long] = inner.reduce(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(b: Array[Long]): Array[Long] = b

  /** The scalar estimate of a finished sketch (== [[KmvDistinct.finish]]). */
  def estimate(b: Array[Long]): Double =
    if (b.length < k) b.length.toDouble
    else (k - 1).toDouble * p / b(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
