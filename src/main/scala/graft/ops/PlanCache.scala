package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * rebuilds (the round-4 q44/q45 regression). PlanLintSpec asserts
  * cap >= 2x [[KnownKeyNames]] (the committed key inventory) and that
  * every key actually requested is committed there, so growth in the
  * inventory can't silently cross the cap again.
  */
private[graft] object PlanCache {

  /** Persist `df` unless a logically-equal plan is already cached —
    * `Dataset.storageLevel` consults the session CacheManager by
    * canonicalized-plan equality, the same lookup that makes a second
    * `persist` log `CacheManager: Asked to cache already cached data`.
    * Re-running a query whose operator persists an intermediate (the
    * RangeNtile/RangeLead freeze, the Jaccard posting table, bench
    * best-of-2 passes) hits this constantly; reusing the live cache
    * entry is both the intent and warning-free.
    */
  def freeze[T](ds: Dataset[T]): Dataset[T] =
    if (ds.storageLevel == StorageLevel.NONE)
      ds.persist(StorageLevel.MEMORY_AND_DISK)
    else ds

  /** Cap on live cached subplans; must stay >= 2x the distinct
    * per-dir key inventory (enforced by PlanLintSpec).
    */
  val cap: Int = 64

  /** The COMMITTED per-dir subplan key inventory — every getOrBuild
    * call site's name literal. The cap tripwire in PlanLintSpec asserts
    * against this constant (so it holds even when the spec runs in
    * isolation, before any registry query has populated the cache) and
    * separately asserts every observed key is listed here (so adding a
    * call site without updating this set fails the build). Keys of the
    * form `cc_<threshold>` are dynamic; only cc_0.8 is cached in
    * practice (other thresholds bypass the cache via
    * jaccardPairsUncached) but the spec accepts the prefix.
    */
  val KnownKeyNames: Set[String] = Set(
    "inverted", "pairs_0.8", "cc_0.8", "sessions", "centroids", "blocks",
    "trade_edges", "q55_uni", "q55_bi", "q57_tf", "q57_topk", "q93_topk",
    "q82_edges", "q125_scounts", "q140_old_labels",
    "copurchase_baskets", "copurchase_pairs", "copurchase_degree",
    "copurchase_adj_deg", "copurchase_deg_min2", "copurchase_oriented",
    "train_unigram", "cust_supp_edges", "corpus_bands", "lsh_cand_pairs",
    "corpus_sigs")

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
        if (evict) e.getValue.unpersist(blocking = false): Unit
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
        val p = freeze(build)
        entries.put(key, p)
        p
      }
    }
}
