package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math over `ArrayType` columns, expressed with Spark higher-order
  * functions so every distance stays inside whole-stage codegen (no UDFs).
  *
  * Semantics mirror the reference's vector module
  * (`/root/reference/src/vector.rs:4-38`):
  *   - magnitude  = L2 norm                    (vector.rs:4-6)
  *   - dot        = elementwise product sum    (vector.rs:9-11)
  *   - cosineSimilarity = dot/(|a||b|) clamped at 0 (vector.rs:14-16)
  *   - cosineDistance   = 1 - similarity, range [0,1] (vector.rs:19-21)
  *   - euclideanDistance (vector.rs:23-29)
  *   - distance = cosineDistance, the engine-wide metric (vector.rs:31-33)
  *
  * All math is done in DoubleType (cast arrays once via [[toDoubleArray]])
  * for numeric stability and DuckDB-oracle parity (SURVEY.md §7.4).
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (do this ONCE per plan). */
  def toDoubleArray(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** L2 norm: sqrt(sum(x^2)). */
  def magnitude(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Dot product via zip_with + left-fold (same fold order as the oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity clamped at 0 (negative similarities -> 0).
    *
    * Zero-magnitude vectors: the reference computes NaN then clamps with
    * Rust `f32::max`, which returns the non-NaN operand — so similarity is
    * 0 (vector.rs:15). We branch explicitly (Spark 4 ANSI mode would raise
    * DIVIDE_BY_ZERO), which also keeps NaN out of hashed oracle outputs.
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = magnitude(a) * magnitude(b)
    when(denom === 0.0, lit(0.0))
      .otherwise(greatest(dot(a, b) / denom, lit(0.0)))
  }

  /** Cosine distance in [0, 1] thanks to the clamp. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Euclidean distance: sqrt(sum((x-y)^2)). */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** The engine-wide metric (aliases cosine distance, like the reference). */
  def distance(a: Column, b: Column): Column = cosineDistance(a, b)
}
