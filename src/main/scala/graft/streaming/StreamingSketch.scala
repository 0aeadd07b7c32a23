package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sketch analytics with bounded state.
  *
  * The batch engine answers "top tokens" with `approx_top_k` or an exact
  * groupBy; a stream wants the same answer continuously WITHOUT per-token
  * state (a groupBy-count stream grows state with the vocabulary). This is
  * the classic Misra-Gries summary: `k` counters per state shard, the
  * decrement-all step when a new token meets a full summary, merged across
  * batches by carrying the summary AS the state. Guarantees (all
  * spec-pinned):
  *
  *   - estimates never exceed true counts (decrements only remove);
  *   - per shard, undercount is at most `dropped/(k+1)` where `dropped` is
  *     the total decremented mass — so any token with true shard-count
  *     greater than `N_shard/(k+1)` is GUARANTEED present in the summary;
  *   - with at most `k` distinct tokens per shard the summary is EXACT
  *     (no decrement ever fires).
  *
  * State per shard is at most `k` (token, count) pairs — fixed forever,
  * RocksDB-friendly, the same bounded-memory contract as
  * [[StreamingDedup.bloomDedup]]. Each micro-batch re-emits a touched
  * shard's full current summary (Append mode): downstream takes the latest
  * emission per (shard, token), typically into a small compacted table.
  */
object StreamingSketch {

  /** One summary entry: `est` is the Misra-Gries counter — a lower bound on
    * the token's true count in the shard's stream so far — and `n_obs` the
    * shard's TOTAL observations processed through this emission. Each
    * micro-batch re-emits the touched shard's full summary (append mode);
    * `n_obs` is strictly increasing per shard, so "the final summary" is
    * recoverable from the sink without any batch-id column: the rows where
    * `n_obs` equals the shard's maximum (the multi-batch gate's compaction).
    */
  final case class TokenCount(shard: Int, token: String, est: Long, n_obs: Long)

  /** Misra-Gries heavy hitters over a (streaming or static) frame with a
    * string `item` column. Within a batch, rows fold in sorted order so the
    * result is layout-independent (Misra-Gries is order-sensitive; sorting
    * pins one canonical order per batch).
    */
  def heavyHitters(items: DataFrame, shards: Int = 8, k: Int = 16): Dataset[TokenCount] = {
    require(shards >= 1 && k >= 1)
    val spark = items.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    items
      .selectExpr("item", s"CAST(pmod(hash60(item), $shards) AS INT) AS shard")
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Map[String, Long], Long), TokenCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[(Map[String, Long], Long)]) =>
          var (m, n) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          rows.map(_._1).toArray.sorted.foreach { it =>
            n += 1
            m.get(it) match {
              case Some(c) => m = m.updated(it, c + 1)
              case None if m.size < k => m = m.updated(it, 1L)
              case None =>
                m = m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
            }
          }
          state.update((m, n))
          m.toSeq.sortBy { case (t, c) => (-c, t) }
            .map { case (t, c) => TokenCount(shard, t, c, n) }.iterator
      }
  }
}
