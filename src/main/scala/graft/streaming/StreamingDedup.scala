package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.DedupQueries
import graft.ops.DedupQueries.MinHashConfig

/** Streaming fuzzy dedup: incremental MinHash-LSH candidate detection over
  * a document stream.
  *
  * The batch pipeline (`dedup_minhash_lsh`) bands signatures and self-joins
  * — a shape that needs the whole corpus. Streaming ingestion wants the
  * incremental question instead: "does THIS document near-duplicate anything
  * seen so far?" That is one stateful operator: key the band rows by
  * (band, sig) and keep the earliest doc_id per bucket; any later arrival in
  * the same bucket is a candidate against that anchor. Keep-earliest matches
  * the batch survivor rule, and the state per bucket is ONE long — the whole
  * index is `#buckets × (key + 8 bytes)`, the same memory the batch band
  * join shuffles, and RocksDB-spillable on a real cluster.
  *
  * Signature construction must be stateless per row (a groupBy signature
  * build would be a second stateful operator in the same query, which
  * Structured Streaming restricts), so this uses
  * [[DedupQueries.bandRowsStateless]] — per-row expressions whose batch
  * equivalence is spec-pinned.
  *
  * Output is the CANDIDATE stream (doc_id, anchor, band): exact-Jaccard
  * verification needs both documents' shingle sets, which is a batch join
  * against the corpus store downstream (same split as the reference
  * pipelines: cheap banding online, exact verify offline). A document
  * colliding with the same anchor in several bands appears once per band —
  * `distinct` on (doc_id, anchor) downstream if multiplicity is unwanted.
  */
object StreamingDedup {

  /** A band collision: `doc_id` arrived after `anchor` (the bucket's
    * earliest document) in band `band`.
    */
  final case class Candidate(doc_id: Long, anchor: Long, band: Int)

  /** A band collision with an in-stream similarity estimate: the fraction
    * of the two documents' `k` minhash components that agree — an unbiased
    * estimator of their shingle Jaccard.
    */
  final case class VerifiedCandidate(doc_id: Long, anchor: Long, band: Int,
                                     est_jaccard: Double)

  /** Flag band collisions against the earliest-seen document per bucket.
    * Works on a streaming OR static frame with (doc_id, text, ...): the
    * stateful path needs a stream, the spec runs the same logic both ways.
    */
  def minhashCandidates(docs: DataFrame,
                        cfg: MinHashConfig = MinHashConfig()): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    DedupQueries.bandRowsStateless(docs, cfg)
      .selectExpr("doc_id", "band", "sig")
      .as[(Long, Int, String)]
      .groupByKey { case (_, band, sig) => (band, sig) }
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[Long]) =>
          // within a batch, process in doc_id order so the smallest batch
          // member anchors the rest; across batches the state carries the
          // running min. EVERY collision emits — also a later arrival with
          // a SMALLER id (it still near-duplicates the bucket's anchor; it
          // then takes the anchor role). Unordered candidate pairs are
          // arrival-order independent; with ids arriving in order the
          // flagged set is exactly "docs with an earlier band-mate".
          val ids = rows.map(_._1).toArray.sorted
          var anchor = state.getOption.getOrElse(Long.MaxValue)
          val out = Array.newBuilder[Candidate]
          ids.foreach { id =>
            if (anchor != Long.MaxValue && id != anchor) out += Candidate(id, anchor, band)
            if (id < anchor) anchor = id
          }
          if (anchor != Long.MaxValue) state.update(anchor)
          out.result().iterator
      }
  }

  /** [[minhashCandidates]] with in-stream verification: each bucket's state
    * also keeps the anchor's FULL minhash signature (k longs — still
    * constant-size, no text retained), and every collision carries the
    * matching-component fraction as an estimated Jaccard. Candidates under
    * `minEstJaccard` are suppressed in-stream — the latency-friendly
    * quality filter; the exact-Jaccard batch join downstream remains the
    * precise path (the estimator's variance is 1/sqrt(k)).
    */
  def minhashVerifiedCandidates(docs: DataFrame,
                                cfg: MinHashConfig = MinHashConfig(),
                                minEstJaccard: Double = 0.0): Dataset[VerifiedCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    DedupQueries.bandRowsStatelessWithSig(docs, cfg)
      .selectExpr("doc_id", "band", "sig", "mhs")
      .as[(Long, Int, String, Array[Long])]
      .groupByKey { case (_, band, sig, _) => (band, sig) }
      .flatMapGroupsWithState[(Long, Array[Long]), VerifiedCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[(Long, Array[Long])]) =>
          val sorted = rows.toArray.sortBy(_._1)
          var (anchor, anchorSig) =
            state.getOption.getOrElse((Long.MaxValue, Array.empty[Long]))
          val out = Array.newBuilder[VerifiedCandidate]
          sorted.foreach { case (id, _, _, mhs) =>
            if (anchor != Long.MaxValue && id != anchor) {
              val matches = mhs.iterator.zip(anchorSig.iterator).count(p => p._1 == p._2)
              val est = matches.toDouble / cfg.k
              if (est >= minEstJaccard) out += VerifiedCandidate(id, anchor, band, est)
            }
            if (id < anchor) { anchor = id; anchorSig = mhs }
          }
          if (anchor != Long.MaxValue) state.update((anchor, anchorSig))
          out.result().iterator
      }
  }
}
