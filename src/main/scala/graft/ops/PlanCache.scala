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
  * stopped test session from being served to a new one. Eviction is
  * access-order LRU with a 64-entry cap: a run touches at most two
  * fixture dirs (bench warm dir + target) and the registry currently
  * materializes ~16 distinct shared subplans per dir, so the live
  * working set is ~32 — the cap must sit well above it or live entries
  * are evicted mid-run and every consumer after the eviction silently
  * rebuilds (the round-4 q44/q45 regression). PlanCacheSpec asserts
  * cap >= 2x the distinct keys actually requested, so growth in the
  * key inventory can't silently cross the cap again.
  */
private[graft] object PlanCache {

  /** Cap on live cached subplans; must stay >= 2x the distinct
    * per-dir key inventory (enforced by PlanCacheSpec).
    */
  val cap: Int = 64

  /** Every distinct subplan name ever requested this JVM — the spec's
    * measurement of the key inventory, independent of eviction.
    */
  private val seenNames = scala.collection.mutable.Set[String]()

  def distinctKeyNames: Set[String] = entries.synchronized(seenNames.toSet)

  private val entries =
    new java.util.LinkedHashMap[(Int, String, String), DataFrame](128, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, String), DataFrame]): Boolean = {
        val evict = size() > cap
        if (evict) e.getValue.unpersist(blocking = false)
        evict
      }
    }

  def getOrBuild(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    entries.synchronized {
      seenNames += name
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
