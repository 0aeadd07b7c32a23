package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialize-then-release for operators built around persist barriers.
  *
  * The fuzzy-dedup / ANN pipelines persist intermediates (tokenized docs,
  * signatures, band rows, the IVF index) because the candidate stage and the
  * verification stage both consume them — without the barrier the whole
  * upstream subtree re-executes per join side, and `CollapseProject` inlines
  * aliased expensive expressions per reference. But a lazily-returned result
  * can never safely unpersist its own inputs: the caller's action still needs
  * them. So every public catalog entry materializes its (small) result first
  * — a reliable checkpoint when the session has a checkpoint dir, else an
  * eager local checkpoint — and only then drops the persisted inputs. A
  * long-lived session composing catalog ops no longer accumulates cached
  * partitions until eviction pressure; `CacheLifecycleSpec` pins
  * `getPersistentRDDs.isEmpty` after every public query.
  *
  * The result is orders of magnitude smaller than the inputs for every
  * wrapped op (pairs / signatures / top-k vs the corpus), so the extra
  * write+read is noise next to the recompute the barrier avoids.
  *
  * Fallback caveat: without a checkpoint dir, `localCheckpoint` itself keeps
  * the RESULT blocks cached until the DataFrame is GC'd (the ContextCleaner
  * releases them) — bounded by the result size, not the intermediates.
  * Reliable-checkpoint FILES outlive the DataFrame unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is enabled; Verify and
  * Bench set it (see README ops notes).
  */
object Lifecycle {

  /** Materialize `result`, then unpersist `inputs`. */
  def released(result: DataFrame, inputs: DataFrame*): DataFrame =
    releasedBy(result)(inputs.foreach(_.unpersist()))

  /** Materialize `result`, then run an arbitrary release action. The
    * release runs even when materialization throws (e.g. a frozen-schema
    * raise_error surfacing at execution): a failing query must not leave
    * its barriers cached either.
    */
  def releasedBy(result: DataFrame)(release: => Unit): DataFrame =
    try {
      val sc = result.sparkSession.sparkContext
      if (sc.getCheckpointDir.isDefined) {
        // Dataset.checkpoint(eager) runs TWO jobs — the eager count and the
        // checkpoint write — and the second recomputes the whole query
        // unless the plan is cached. Persist around the checkpoint so the
        // expensive pipeline executes once (the write job reads the cache),
        // then drop the cache: only the checkpoint files back the result.
        val cached = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try cached.checkpoint(eager = true)
        finally cached.unpersist()
      } else result.localCheckpoint(eager = true)
    } finally release
}
