package graft.knn

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}

/** Bounded-driver batching for scatter-gather ANN search.
  *
  * The query side of a batch search is 5% of the dataset by
  * construction (`/root/reference/src/dataset.rs:19-23`), so collecting
  * it whole onto the driver — which the r3 ANN batch paths did — is a
  * 5 TB driver allocation at 100 TB. [[chunked]] streams the query
  * split through the driver in blocks of at most `maxQueryBatch` rows
  * (`toLocalIterator` fetches one partition at a time, so resident
  * memory is one block + one partition), runs `search` per block, and
  * eagerly materializes each block's small (qid, vec_id, dist, rk)
  * result via `localCheckpoint` — the union's lineage then holds the
  * result tables, never the query vectors, and earlier blocks'
  * broadcasts become collectable while later blocks run.
  *
  * Blocks partition the qid space, so per-qid top-k and ranks are
  * unaffected by the blocking (each qid's candidates live entirely in
  * its own block's search).
  */
object QueryBlocks {

  /** Default driver bound: 4096 queries x (id + dim doubles) resident
    * at once — a few MB at dim 64, independent of total query count.
    */
  val DefaultMaxQueryBatch = 4096

  def chunked(queries: Dataset[(Long, Array[Double])], maxQueryBatch: Int)(
      search: Array[(Long, Array[Double])] => DataFrame): DataFrame = {
    require(maxQueryBatch > 0, s"maxQueryBatch must be > 0, got $maxQueryBatch")
    val blocks = queries.toLocalIterator().asScala.grouped(maxQueryBatch)
    if (!blocks.hasNext) return search(Array.empty)
    val first = blocks.next().toArray
    // common case — the whole batch fits the bound: same single-job
    // plan as an unchunked search, no checkpoint materialization
    if (!blocks.hasNext) return search(first)
    var acc = List(search(first).localCheckpoint(true))
    while (blocks.hasNext)
      acc ::= search(blocks.next().toArray).localCheckpoint(true)
    acc.reverse.reduceLeft(_ unionByName _)
  }
}
