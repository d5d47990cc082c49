package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of persisted shared scans.
  *
  * Several query families branch off one expensive scan (cluster
  * aggregate, sessioned hits, embedding vectors, shingle sets,
  * reliability intervals); within one Verify/Bench session that scan
  * should run once. Entries are keyed by (session, data dir, scan name)
  * and EVICTED when the owning SparkContext stops — a long-lived JVM
  * that cycles sessions (test suites) no longer accumulates stale
  * persisted plans (the storage itself dies with the context; eviction
  * drops the map references so the plans can be collected).
  */
object ScanCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkContext, java.lang.Boolean]())

  /** Persisted `build` result, computed at most once per (session, key).
    * The build runs OUTSIDE the map update (putIfAbsent, not
    * computeIfAbsent) so cached builders may freely invoke other cached
    * builders without recursive-update hazards; a lost race unpersists
    * its duplicate. */
  def get(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    hook(s)
    val k = (s, key)
    val cur = cache.get(k)
    if (cur != null) cur
    else {
      val built = build.persist()
      val prev = cache.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(blocking = false); prev }
      else built
    }
  }

  /** Test access: live entries owned by `sc` (ScanCacheSpec). */
  private[graft] def entriesOwnedBy(sc: SparkContext): Int = {
    var n = 0
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext eq sc) n += 1
    n
  }

  /** Drop every entry owned by `sc` once that context ends. */
  private def hook(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (hooked.add(sc)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          val it = cache.keySet().iterator()
          while (it.hasNext) {
            val key = it.next()
            if (key._1.sparkContext eq sc) it.remove()
          }
          hooked.remove(sc)
        }
      })
    }
  }
}
