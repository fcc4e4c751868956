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
  private val locks = new ConcurrentHashMap[String, Object]()
  /** appIds that already carry an eviction listener. */
  private val watched = ConcurrentHashMap.newKeySet[String]()

  /** Drop every entry belonging to `appId` — called when its context
    * ends, so a long-lived JVM running many sessions never accumulates
    * dangling handles that pin dead sessions' plans in driver memory.
    */
  private def evict(appId: String): Unit = {
    val prefix = appId + "|"
    cache.keySet.removeIf(_.startsWith(prefix))
    locks.keySet.removeIf(_.startsWith(prefix))
    watched.remove(appId)
  }

  /** Memoize `build` under (session, key). The build runs at most once
    * per key; concurrent callers of the same key block until it
    * completes. Builds run OUTSIDE the map's compute function (under a
    * per-key lock) because builds re-enter the cache for other keys
    * (the jaccard-pairs build calls gramHashSets) — nesting inside
    * computeIfAbsent violates the CHM contract and throws "Recursive
    * update" whenever the two keys share a bin.
    */
  def getOrBuild[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    if (watched.add(appId)) // evict this app's entries when its context ends
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = evict(appId)
      })
    val full = appId + "|" + key
    val hit = cache.get(full)
    if (hit != null) return hit.asInstanceOf[T]
    val lock = locks.computeIfAbsent(full, new JFunction[String, Object] {
      override def apply(k: String): Object = new Object
    })
    lock.synchronized {
      val again = cache.get(full)
      if (again != null) again.asInstanceOf[T]
      else {
        val built = build
        cache.put(full, built)
        built
      }
    }
  }

  /** Drop all entries (tests). Persisted datasets are left to Spark's
    * ContextCleaner / session stop.
    */
  def clear(): Unit = { cache.clear(); locks.clear() }
}
