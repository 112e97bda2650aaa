package graft.cache

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Query-result + subquery caching — the Spark-side analog of the
  * reference's cache subsystem (graphlite/src/cache/result_cache.rs:147
  * `QueryResultCache`, subquery_cache.rs, invalidation.rs).
  *
  * Design differences from the reference, deliberately Spark-first:
  *
  *  - The reference interposes an LRU of interpreter row vectors inside
  *    its executor; here a statement's result is a *DataFrame*, so the
  *    cache stores the collected rows + schema and replays them through
  *    `spark.createDataFrame` (a local scan — no job, no shuffle).
  *  - Invalidation is *versioned* rather than event-subscribed
  *    (invalidation.rs `InvalidationStrategy::Versioned`): the session
  *    epoch is part of every key and every write (DML/DDL/catalog
  *    change) bumps it, so stale entries can never hit — they simply age
  *    out of the LRU. This is the write-through strategy
  *    (invalidation.rs:49-58) collapsed onto copy-on-write graphs, where
  *    "which tables changed" is always "the current graph version".
  *  - Keys are parameter-aware (result_cache.rs:19-23 `QueryCacheKey`:
  *    query hash + parameters + graph version + user context): same text
  *    with different `$param` bindings or a different authenticated user
  *    occupies distinct entries.
  *
  * Scale note: entries are driver-local and row-bounded (`maxRowsPerEntry`)
  * — this is a serving-layer cache for small, hot results (dashboards,
  * point lookups), NOT a dataset cache; big frames stay lazy and
  * distributed, and `persist()` remains the tool for those.
  */
final class ResultCache(
    val maxEntries: Int = 256,
    val maxRowsPerEntry: Int = 10000,
    val ttlMillis: Long = 10 * 60 * 1000L) {

  /** result_cache.rs:19-23 — query hash, parameters, graph version,
    * user context. `numbersF64` is ours (session numeric mode changes
    * results, so it must key).
    */
  final case class Key(queryText: String, params: Map[String, Any],
      epoch: Long, user: String, numbersF64: Boolean)

  private final case class Entry(rows: Array[Row], schema: StructType,
      storedAt: Long, var lastAccess: Long)

  // LinkedHashMap in access order = LRU tracker (result_cache.rs LRUTracker)
  private val entries = new java.util.LinkedHashMap[Key, Entry](64, 0.75f, true)

  @volatile private var hitCount = 0L
  @volatile private var missCount = 0L
  @volatile private var evictCount = 0L
  @volatile private var invalidateCount = 0L
  @volatile private var skippedOversize = 0L

  private def now(): Long = System.currentTimeMillis()

  /** Look up; expired entries are removed on touch (TTL strategy,
    * invalidation.rs:18-25).
    */
  def get(key: Key, spark: SparkSession): Option[DataFrame] = synchronized {
    val e = entries.get(key)
    if (e == null) { missCount += 1; None }
    else if (now() - e.storedAt > ttlMillis) {
      entries.remove(key); invalidateCount += 1; missCount += 1; None
    } else {
      e.lastAccess = now()
      hitCount += 1
      Some(spark.createDataFrame(
        java.util.Arrays.asList(e.rows: _*), e.schema))
    }
  }

  /** Store a collected result; oversize results are skipped, not
    * truncated (a partial result must never serve as the whole).
    */
  def put(key: Key, rows: Array[Row], schema: StructType): Unit = synchronized {
    if (rows.length > maxRowsPerEntry) { skippedOversize += 1; return }
    entries.put(key, Entry(rows, schema, now(), now()))
    while (entries.size > maxEntries) {
      val it = entries.entrySet().iterator()
      it.next(); it.remove()
      evictCount += 1
    }
  }

  /** Drop every entry not at the given epoch — called after writes so
    * superseded results free memory immediately instead of aging out.
    */
  def invalidateBefore(epoch: Long): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.epoch != epoch) { it.remove(); invalidateCount += 1 }
    }
  }

  def clear(): Unit = synchronized {
    invalidateCount += entries.size()
    entries.clear()
  }

  def size: Int = synchronized(entries.size())

  /** (hits, misses, evictions, invalidations, entries, oversizeSkips). */
  def stats: (Long, Long, Long, Long, Long, Long) =
    (hitCount, missCount, evictCount, invalidateCount, size.toLong,
      skippedOversize)
}

/** Cross-statement memoization of *uncorrelated scalar subquery* values
  * (subquery_cache.rs): two different outer queries sharing
  * `(SELECT max(x) …)`-shaped inner queries reuse one evaluation. The
  * cached unit is the single scalar (value + type), keyed by the
  * subquery's structural AST plus the session epoch — Scala case-class
  * equality gives the reference's `expression_hash` for free, and the
  * epoch gives versioned invalidation.
  *
  * Correlated subqueries are NOT cached here: they compile to per-key
  * group-by + join plans whose reuse Catalyst already handles via
  * exchange reuse within a statement, and whose result is a frame, not a
  * value.
  */
final class SubqueryCache(val maxEntries: Int = 512) {
  private val entries =
    new java.util.LinkedHashMap[(Any, Long), (Any, DataType)](64, 0.75f, true)

  @volatile private var hitCount = 0L
  @volatile private var missCount = 0L
  @volatile private var evictCount = 0L

  def getOrCompute(astKey: Any, epoch: Long)(
      compute: => (Any, DataType)): (Any, DataType) = synchronized {
    val k = (astKey, epoch)
    val cached = entries.get(k)
    if (cached != null) { hitCount += 1; cached }
    else {
      missCount += 1
      val v = compute
      entries.put(k, v)
      while (entries.size > maxEntries) {
        val it = entries.entrySet().iterator()
        it.next(); it.remove()
        evictCount += 1
      }
      v
    }
  }

  def clear(): Unit = synchronized(entries.clear())
  def size: Int = synchronized(entries.size())
  def stats: (Long, Long, Long) = (hitCount, missCount, evictCount)
}
