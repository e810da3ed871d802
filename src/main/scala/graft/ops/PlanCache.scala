package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-DataFrame cache keyed by (session, fixture
  * dir, table name) — the shared-subplan pattern behind the Jaccard
  * family's posting table, generalized so any operator with an
  * expensive subplan consumed by several registry queries (or several
  * times inside one iterative query) can reuse one materialization per
  * Verify/Bench run instead of rebuilding per call.
  *
  * Keying by session identity (not just dir) keeps entries from a
  * stopped test session from being served to a new one; the footprint
  * stays bounded because a run touches at most two fixture dirs
  * (bench warm dir + target), evicted oldest-first past 16 entries
  * (the registry currently materializes 10 distinct shared subplans
  * per dir — a cap below that evicts live entries mid-run and every
  * consumer after the eviction silently rebuilds).
  */
private[graft] object PlanCache {
  private val entries =
    new java.util.LinkedHashMap[(Int, String, String), DataFrame](32, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, String), DataFrame]): Boolean = {
        val evict = size() > 16
        if (evict) e.getValue.unpersist(blocking = false)
        evict
      }
    }

  def getOrBuild(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    entries.synchronized {
      val key = (System.identityHashCode(s), dir, name)
      val cached = entries.get(key)
      if (cached != null) cached
      else {
        val p = build.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(key, p)
        p
      }
    }
}
