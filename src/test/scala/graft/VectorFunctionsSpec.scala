package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Unit + property tests for the vector math (FIXTURES.md §C; semantics
  * from /root/reference/src/vector.rs). Property tests use a seeded
  * sampler (no scalatest-scalacheck bridge in the offline cache).
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def distOf(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosineDistance($"a", $"b").as("d")).head().getDouble(0)

  test("orthogonal vectors: similarity 0, distance 1") {
    assert(distOf(Seq(1, 0), Seq(0, 1)) === 1.0)
  }

  test("identical vectors: distance 0") {
    assert(math.abs(distOf(Seq(1, 0), Seq(1, 0))) < 1e-12)
  }

  test("opposite vectors: similarity clamped to 0 -> distance 1") {
    // reference clamp: /root/reference/src/vector.rs:15
    assert(distOf(Seq(1, 0), Seq(-1, 0)) === 1.0)
  }

  test("euclidean distance of 3-4-5 triangle") {
    val d = Seq((Seq(0.0, 0.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(euclideanDistance($"a", $"b").as("d")).head().getDouble(0)
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("magnitude and dot") {
    val r = Seq((Seq(3.0, 4.0), Seq(2.0, 1.0))).toDF("a", "b")
      .select(magnitude($"a").as("m"), dot($"a", $"b").as("d")).head()
    assert(r.getDouble(0) === 5.0 && r.getDouble(1) === 10.0)
  }

  test("zero-magnitude vector: clamp absorbs NaN -> distance 1 " +
       "(Rust f32::max returns the non-NaN operand, vector.rs:15)") {
    assert(distOf(Seq(0, 0), Seq(1, 0)) === 1.0)
  }

  private def sampleVecs(seed: Int, n: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(1 + rng.nextInt(16))(rng.nextDouble() * 20 - 10))
      .map(v => if (v.forall(x => math.abs(x) < 1e-3)) v.updated(0, 1.0) else v)
  }

  test("property: 0 <= cosine distance <= 1 for non-zero vectors") {
    val vs = sampleVecs(42, 100)
    for (Seq(a, b) <- vs.sliding(2)) {
      val n = math.min(a.size, b.size)
      val d = distOf(a.take(n), b.take(n))
      assert(d >= 0.0 && d <= 1.0 + 1e-12, s"a=$a b=$b d=$d")
    }
  }

  test("property: distance(a, a) ~ 0") {
    for (a <- sampleVecs(7, 50)) assert(math.abs(distOf(a, a)) < 1e-9)
  }
}
