package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side memo for KB-sized computed statistics — the one blessed way a
  * family of catalog entries shares an expensive chain (PCA: 12.7 s → 1.4 s;
  * quality training; substring extraction): the first consumer pays the
  * corpus pass, the result rows are collected ONCE per (session, key) and
  * replayed as a local relation — bit-identical values, no cached
  * partitions, nothing in the block store (CacheLifecycleSpec's contract).
  *
  * The session rides in the cache key, so a new session (or a new dir inside
  * the key) recomputes; entries owned by STOPPED sessions are purged across
  * EVERY registered memo on every access (a long-lived JVM cycling
  * SparkSessions — a test suite — must not retain collected rows or session
  * references through a memo that's never touched again). First computation
  * is single-flight: concurrent first access races on `putIfAbsent` and the
  * loser reuses the winner's lazily-evaluated cell, so the corpus pass runs
  * exactly once. Regenerating data under the SAME dir within one session is
  * the one case the cache cannot see — call [[DriverMemo.invalidateAll]]
  * (or the owning memo's [[invalidate]]) after rewriting files in place.
  */
final class DriverMemo[K] {
  import DriverMemo.Cell

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, K), Cell]

  DriverMemo.register(this)

  /** Drop every memoized statistic held by this memo. */
  def invalidate(): Unit = memo.clear()

  private[ops] def purgeStopped(): Unit =
    memo.keysIterator.filter(_._1.sparkContext.isStopped).foreach(memo.remove)

  /** Replay the memoized statistic for (session, key), computing (and
    * collecting) `compute` on first access.
    */
  def cached(s: SparkSession, key: K)(compute: => DataFrame): DataFrame = {
    DriverMemo.purgeAllStopped()
    val cell = new Cell(() => {
      val df = compute
      (df.schema, df.collect())
    })
    val (schema, rows) = memo.putIfAbsent((s, key), cell).getOrElse(cell).value
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}

object DriverMemo {
  /** Lazily-evaluated holder: `lazy val` gives the single-flight guarantee
    * TrieMap.getOrElseUpdate lacks (it may evaluate a racing compute twice).
    */
  private final class Cell(compute: () => (StructType, Array[Row])) {
    lazy val value: (StructType, Array[Row]) = compute()
  }

  private val all = new java.util.concurrent.CopyOnWriteArrayList[DriverMemo[_]]()

  private def register(m: DriverMemo[_]): Unit = all.add(m)

  /** Purge stopped-session entries in EVERY registered memo — called from
    * each cached() so one active family releases the others' dead rows too.
    */
  private def purgeAllStopped(): Unit = all.forEach(_.purgeStopped())

  /** The one invalidation entry point: drop EVERY memoized driver statistic
    * (PCA chains, trained weights, substring extractions). Call after
    * regenerating data in place under a dir some entry already computed on.
    */
  def invalidateAll(): Unit = all.forEach(_.invalidate())
}
