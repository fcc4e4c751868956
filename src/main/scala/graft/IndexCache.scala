package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.SparkSession

/** Dataset-scoped build-once/search-many memoization — the vector-db
  * usage pattern (the reference builds each index once and then serves
  * any number of searches against it, `/root/reference/src/main.rs:70-87`;
  * our per-query entry points would otherwise rebuild the HNSW shard
  * graphs / re-train IVF centroids / re-derive the exact ground truth on
  * every call).
  *
  * Keys include the owning SparkSession's applicationId so a stopped
  * session's dangling persisted datasets are never handed to a new one
  * (ScalaTest suites start/stop many sessions per JVM).
  *
  * Scale notes: entries hold either driver-tiny values (centroid
  * matrices) or handles to `.persist()`-ed distributed datasets (shard
  * graphs, assigned tables, ground-truth top-k) — the cache itself never
  * holds row data on the driver. At 100 TB the same role is played by a
  * persisted index TABLE (bucketed parquet of signatures / assignments /
  * serialized shard graphs); this in-JVM map is the session-local
  * equivalent.
  */
object IndexCache {

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Memoize `build` under (session, key). The build runs at most once
    * per key; concurrent callers block until it completes.
    */
  def getOrBuild[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val full = spark.sparkContext.applicationId + "|" + key
    cache.computeIfAbsent(full, new JFunction[String, AnyRef] {
      override def apply(k: String): AnyRef = build
    }).asInstanceOf[T]
  }

  /** Drop all entries (tests). Persisted datasets are left to Spark's
    * ContextCleaner / session stop.
    */
  def clear(): Unit = cache.clear()
}
