package graft

import graft.functions.CountMin
import graft.operators.TextOps

class CountMinSpec extends SparkSpec {

  test("never underestimates; exact when collision-free; merge == reduce") {
    val cms = CountMin(depth = 4, width = 64)
    val rnd = new scala.util.Random(7)
    // skewed stream: key 1 is hot, 200 cold keys force collisions at width 64
    val stream = Seq.fill(500)(1L) ++ (1 to 2000).map(_ => 2L + rnd.nextInt(200))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = stream.foldLeft(cms.zero)(cms.reduce)
    exact.foreach { case (k, c) =>
      val est = cms.estimate(sketch, k)
      assert(est >= c, s"CMS must overestimate: key=$k est=$est exact=$c")
      // eps*N bound with eps = e/width, N = stream size (Markov, per row;
      // depth 4 makes the failure probability e^-4 — deterministic seed
      // keeps this assertion stable)
      assert(est <= c + (math.E / 64 * stream.size).ceil.toLong,
        s"eps*N bound: key=$k est=$est exact=$c")
    }
    // merge of split halves equals single-pass reduce, bit for bit
    val (h1, h2) = stream.splitAt(stream.size / 2)
    val merged = cms.merge(h1.foldLeft(cms.zero)(cms.reduce),
      h2.foldLeft(cms.zero)(cms.reduce))
    assert(merged.sameElements(sketch))
    // wide grid + few keys => estimates exact (the declared-query regime)
    val wide = CountMin(depth = 4, width = 32768)
    val wSketch = stream.foldLeft(wide.zero)(wide.reduce)
    exact.foreach { case (k, c) => assert(wide.estimate(wSketch, k) == c) }
  }

  test("declared heavy-hitter query: estimates exact at declared width") {
    val rows = TextOps.cmsHeavyHitters(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"user=${r.getLong(0)} est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
    // descending by estimate, user_id tie-break
    val ests = rows.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(ests == ests.sorted)
  }
}
