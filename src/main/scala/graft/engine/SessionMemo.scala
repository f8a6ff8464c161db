package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) memo for materialized-view spines (shingles,
  * LSH pairs, cluster labels, ancestor closures, resolved relations).
  *
  * Keyed by a per-session UUID held in an identity-weak side table — a
  * true unique id, unlike `System.identityHashCode`, which can collide
  * between two sessions and hand one session a plan bound to another
  * (possibly stopped) one. Entries whose owning context has stopped
  * are swept on every access, so cached/persisted/localCheckpoint'd
  * plans can't outlive their session for the JVM lifetime (ADVICE r3).
  */
private[graft] final class SessionMemo[K] {
  private val m = TrieMap.empty[(String, K), (SparkSession, DataFrame)]

  def getOrElseUpdate(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    m.filterInPlace { case (_, (owner, _)) => !owner.sparkContext.isStopped }
    m.getOrElseUpdate((SessionMemo.idOf(s), k), (s, build))._2
  }
}

private[graft] object SessionMemo {
  // WeakHashMap: identity-keyed, and the String value holds no
  // reference back to the session, so an unreferenced session's entry
  // is collectable (a cache keyed directly on the session object would
  // pin it — the memoized DataFrames reference their session).
  private val ids = new java.util.WeakHashMap[SparkSession, String]()
  private def idOf(s: SparkSession): String = ids.synchronized {
    var v = ids.get(s)
    if (v == null) { v = java.util.UUID.randomUUID().toString; ids.put(s, v) }
    v
  }
}
