package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{DedupQueries, Tokenize}
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

  /** A first-seen document that survived [[bloomDedup]]. */
  final case class FirstSeen(doc_id: Long, fp: Long, shard: Int)

  /** Bounded-state streaming EXACT dedup — the production fix for
    * `dropDuplicates`' unbounded state (one state row per distinct key,
    * forever, on an unbounded stream). Each of `shards` state keys holds one
    * fixed-size bloom bit array of every fingerprint routed to it; a row
    * whose shard bloom rejects its fingerprint is definitively first-seen
    * (no false negatives — emitted), a probable hit is dropped. True
    * duplicates are therefore ALWAYS dropped; a novel document is wrongly
    * dropped only at the bloom's false-positive rate — the documented
    * trade, dialed by `bitsPerShard` (state is `shards * bitsPerShard / 8`
    * bytes TOTAL, independent of stream length; k=4 probe bits put the FP
    * rate at ~(n_seen_per_shard * 4 / bits)^4).
    *
    * Works on a streaming OR static frame with (doc_id, text): the spec
    * pins stream-vs-dropDuplicates equality at a sizing where no false
    * positive occurs, and the false-positive behavior itself on a tiny
    * filter. Within a batch, rows process in doc_id order (deterministic
    * survivor, matching `dedup_exact`'s keep-smallest rule).
    */
  def bloomDedup(docs: DataFrame, shards: Int = 16,
                 bitsPerShard: Int = 1 << 16): Dataset[FirstSeen] = {
    require(Integer.bitCount(bitsPerShard) == 1, "bitsPerShard must be a power of two")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val mask = bitsPerShard - 1
    docs
      .selectExpr(
        "doc_id",
        s"hash60(md5(CAST(regexp_replace(lower(trim(text)), '[${Tokenize.WsClassSql}]+', ' ') AS BINARY))) AS fp",
        s"CAST(pmod(hash60(md5(CAST(regexp_replace(lower(trim(text)), '[${Tokenize.WsClassSql}]+', ' ') AS BINARY))), $shards) AS INT) AS shard")
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Array[Long], FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[Array[Long]]) =>
          val bits = state.getOption.getOrElse(new Array[Long](bitsPerShard / 64))
          // 4 probe positions from two independent 30-bit halves of the
          // 60-bit fingerprint (classic double hashing: g_i = h1 + i*h2)
          def probes(fp: Long): Seq[Int] = {
            val h1 = (fp >>> 30).toInt; val h2 = (fp & ((1L << 30) - 1)).toInt | 1
            (0 until 4).map(i => (h1 + i * h2) & mask)
          }
          val out = Array.newBuilder[FirstSeen]
          rows.toArray.sortBy(_._1).foreach { case (id, fp, _) =>
            val ps = probes(fp)
            if (!ps.forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0)) {
              out += FirstSeen(id, fp, shard)
              ps.foreach(p => bits(p >> 6) |= 1L << (p & 63))
            }
          }
          state.update(bits)
          out.result().iterator
      }
  }

  /** Watermark-TTL exact dedup — the third point on the streaming-dedup
    * state spectrum, between `dropDuplicates` (exact forever, unbounded
    * state) and [[bloomDedup]] (bounded state forever, probabilistic):
    * exact within a time horizon, with state EVICTED once the watermark
    * passes a key's expiry. Duplicates arriving within `delay` of the
    * first sighting are guaranteed dropped; a re-arrival after eviction is
    * re-emitted (the documented trade — most real duplicate storms are
    * near-in-time: replayed batches, at-least-once upstreams, double
    * clicks). State is bounded by the horizon's distinct-key arrival rate,
    * not the stream's lifetime.
    *
    * Uses the engine's own `dropDuplicatesWithinWatermark` so eviction
    * rides the watermark machinery (RocksDB-spillable, checkpoint-
    * restorable) instead of a hand-rolled timeout loop. Fingerprint
    * normalization matches `dedup_exact` / [[bloomDedup]].
    */
  def ttlDedup(docs: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.registerAll(spark)
    docs
      .selectExpr("doc_id", "ts",
        s"md5(CAST(regexp_replace(lower(trim(text)), '[${Tokenize.WsClassSql}]+', ' ') AS BINARY)) AS fp")
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
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

  /** A winnow-fingerprint collision: `doc_id` shares a MOSS fingerprint —
    * hence a token run — with `anchor`, the fingerprint's earliest-seen
    * document.
    */
  final case class WinnowCandidate(doc_id: Long, anchor: Long, fp: Long)

  /** Per-bucket state for [[winnowCandidates]]: the earliest doc plus how
    * many candidates this fingerprint has already emitted (the streaming
    * form of the batch hot-fingerprint cap).
    */
  final case class WinnowBucket(anchor: Long, emitted: Int)

  /** Streaming PARTIAL-overlap detection — the incremental form of
    * `text_winnow_pairs`: the per-document winnowed fingerprints
    * ([[graft.ops.TextQueries.winnowFrom]]'s selection, computed here as
    * stateless per-row expressions — the distinct runs INSIDE the row via
    * array_distinct, since a second stateful operator is off-limits), keyed
    * by fingerprint with one (anchor, count) state per bucket. Any later
    * arrival sharing a fingerprint is a candidate against the earliest
    * carrier: by the winnowing guarantee, every pair of documents sharing a
    * >= k+w-1-token run WILL collide on some fingerprint. `maxEmitsPerFp`
    * is the batch `maxDocFreq` cap in streaming form — a boilerplate
    * fingerprint stops emitting (not accumulating) past the cap, so a hot
    * bucket's output is bounded while its state stays one (long, int).
    * Downstream, `minShared`-style ranking is a batch aggregation over the
    * candidate stream, and run EXTRACTION (`dedup_substring`) is the
    * offline join against the corpus store — the same online-cheap /
    * offline-exact split as [[minhashCandidates]].
    */
  /** A VERIFIED maximal shared token run between the arriving document and
    * the fingerprint's anchor — the streaming face of
    * [[graft.ops.DedupQueries.dedupSubstringFrom]]'s output rows
    * (`doc_a < doc_b`; starts are 1-based token indices).
    */
  final case class SubstringRun(doc_a: Long, doc_b: Long,
                                start_a: Int, start_b: Int, run_len: Int)

  /** Per-fingerprint state for [[substringCandidates]]: the anchor document,
    * ONE representative gram position (the earliest — sufficient for maximal
    * runs whose shared region has no internal k-gram repeat, the same
    * precondition as the batch MOSS-completeness argument), a BOUNDED token
    * window around that gram, and the emit budget used.
    *
    * The window — `ctxTokens` tokens each side of the k-gram, `off` its
    * 0-based offset into the document — is what keeps aggregate state
    * linear: winnowing selects ~n/w fingerprints per n-token document, so
    * storing the FULL token array per anchored bucket (the round-9 shape)
    * is O(n²/w) state per long document; the window caps each bucket at
    * 2·ctx + k tokens, restoring O(n·ctx/w) — the substring analog of
    * [[minhashVerifiedCandidates]]'s "no text in state, only the bounded
    * signature" rule. The price is truncation: extension stops at the
    * window edge, so an emitted run clips at k + 2·ctx tokens. When runs
    * longer than any affordable window matter, use the clip-FREE split
    * instead: [[substringPointerCandidates]] online (k gram tokens of
    * state per bucket, pointers out) +
    * [[graft.ops.DedupQueries.resolveSubstringPointers]] offline — full
    * maximal runs of any length, hash-gated by the
    * `stream_dedup_substring_exact` entry.
    */
  final case class SubstringBucket(anchor: Long, pos: Int, off: Int,
                                   win: Array[String], emitted: Int)

  /** The bounded anchor window: `ctx` tokens each side of the k-gram at
    * 1-based `pos`, returned with its 0-based document offset.
    */
  private[streaming] def anchorWindow(tks: Array[String], pos: Int, k: Int,
                                      ctx: Int): (Array[String], Int) = {
    val ws = math.max(0, pos - 1 - ctx)
    val we = math.min(tks.length, pos - 1 + k + ctx)
    (java.util.Arrays.copyOfRange(tks, ws, we), ws)
  }

  /** Streaming EXACT-SUBSTRING extraction — the incremental form of the
    * batch `dedup_substring` chain: winnowed fingerprints WITH positions
    * (stateless per-row expressions, the [[winnowCandidates]] build plus the
    * selected position), keyed by fingerprint; each bucket's state holds the
    * anchor's (id, position, tokens). A later arrival sharing a fingerprint
    * is verified token-for-token at the anchor gram (a hash collision can
    * only ADD a candidate; this removes it) and extended left/right to the
    * first mismatch — the identical verify+extend semantics as the batch
    * kernel, run against the state instead of a corpus join. Emitted rows
    * are (doc_a, doc_b, start_a, start_b, run_len) with `doc_a < doc_b`,
    * filtered to `minLen` — every one a token-verified true shared run.
    *
    * `maxEmitsPerFp` bounds a hot fingerprint's output (the batch
    * `maxDocFreq` cap in streaming form). Several fingerprints inside one
    * shared region each emit the same maximal run — `.distinct()` downstream
    * collapses them, exactly like the batch kernel's final distinct (a
    * per-batch distinct cannot dedupe across micro-batches; the
    * online-cheap / offline-exact split again). On a corpus whose shared
    * regions contain no internally-repeated k-gram and whose fingerprints
    * are carried by at most two documents, the distinct output in static
    * mode EQUALS `dedupSubstringFrom` row-for-row (spec-pinned on the
    * constructed overlap corpus).
    */
  def substringCandidates(docs: DataFrame,
                          k: Int = graft.ops.TextQueries.WinnowK,
                          w: Int = graft.ops.TextQueries.WinnowW,
                          minLen: Int = -1,
                          maxEmitsPerFp: Int = 50,
                          ctxTokens: Int = 200): Dataset[SubstringRun] = {
    val minL = if (minLen > 0) minLen else k + w - 1
    require(k >= 1 && w >= 1 && minL >= k && maxEmitsPerFp >= 1 && ctxTokens >= minL)
    val spark = docs.sparkSession
    import spark.implicits._
    winnowPositionRows(docs, k, w)
      .groupByKey(_._2)
      .flatMapGroupsWithState[SubstringBucket, SubstringRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[SubstringBucket]) =>
          // doc_id order within the batch (smallest anchors the rest);
          // ascending pos keeps the earliest position as the representative
          val sorted = rows.toArray.sortBy(r => (r._1, r._3))
          var SubstringBucket(anchor, apos, aoff, awin, emitted) =
            state.getOption.getOrElse(SubstringBucket(Long.MaxValue, 0, 0, Array.empty, 0))
          val out = Array.newBuilder[SubstringRun]
          sorted.foreach { case (id, _, pos, tks) =>
            if (anchor != Long.MaxValue && id != anchor && emitted < maxEmitsPerFp) {
              // orient the pair doc_a < doc_b like the batch anchors join;
              // the anchor side verifies inside its bounded window
              val (ta, pa, tb, pb) =
                if (anchor < id) (awin, apos - aoff, tks, pos)
                else (tks, pos, awin, apos - aoff)
              verifyExtend(ta, pa, tb, pb, k).foreach { case (extL, extR) =>
                val runLen = extL + k + extR
                if (runLen >= minL) {
                  // report starts in DOCUMENT coordinates on both sides
                  val (da, db, sa, sb) =
                    if (anchor < id) (anchor, id, apos - extL, pos - extL)
                    else (id, anchor, pos - extL, apos - extL)
                  out += SubstringRun(da, db, sa, sb, runLen)
                  emitted += 1
                }
              }
            }
            if (id < anchor) {
              anchor = id; apos = pos
              val (wn, of) = anchorWindow(tks, pos, k, ctxTokens)
              awin = wn; aoff = of
            }
          }
          if (anchor != Long.MaxValue)
            state.update(SubstringBucket(anchor, apos, aoff, awin, emitted))
          out.result().iterator
      }
  }

  /** A verified-gram POINTER between the arriving document and the
    * fingerprint's anchor — coordinates only, zero retained text: the
    * offline pass ([[graft.ops.DedupQueries.resolveSubstringPointers]])
    * joins the corpus store back and extends to the FULL maximal run.
    * `doc_a < doc_b`; positions are 1-based gram starts in document
    * coordinates.
    */
  final case class SubstringPointer(doc_a: Long, doc_b: Long,
                                    pos_a: Int, pos_b: Int)

  /** Per-fingerprint state for [[substringPointerCandidates]]: the anchor
    * document, its representative gram position, the k gram TOKENS (enough
    * to drop hash collisions online — nothing more), and the emit budget.
    */
  final case class PointerBucket(anchor: Long, pos: Int,
                                 gram: Array[String], emitted: Int)

  /** The ONLINE half of exact-substring dedup with NO run-length cap — the
    * online-cheap / offline-exact split that removes
    * [[substringCandidates]]'s documented k + 2·ctx clip: state per bucket
    * is (anchor id, position, the k anchor-gram tokens) — O(n·k/w)
    * aggregate state, SMALLER than the bounded-window kernel — and the
    * emitted rows are verified-gram pointers, not runs. Verification
    * (the hash-collision guard) happens in-stream against the stored
    * gram; EXTENSION is deferred to the offline pass
    * ([[graft.ops.DedupQueries.resolveSubstringPointers]], typically a
    * `foreachBatch` join against the corpus store), which runs the batch
    * kernel's own extend expressions and therefore recovers full maximal
    * runs of ANY length. On a corpus whose shared regions contain no
    * internally-repeated k-gram and whose fingerprints are carried by at
    * most two documents, the resolved distinct output EQUALS
    * `dedupSubstringFrom` row-for-row in any micro-batch split (the
    * multi-batch gate entry hash-checks exactly that).
    */
  def substringPointerCandidates(docs: DataFrame,
                                 k: Int = graft.ops.TextQueries.WinnowK,
                                 w: Int = graft.ops.TextQueries.WinnowW,
                                 maxEmitsPerFp: Int = 50): Dataset[SubstringPointer] = {
    require(k >= 1 && w >= 1 && maxEmitsPerFp >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    winnowPositionRows(docs, k, w)
      .groupByKey(_._2)
      .flatMapGroupsWithState[PointerBucket, SubstringPointer](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[PointerBucket]) =>
          val sorted = rows.toArray.sortBy(r => (r._1, r._3))
          var PointerBucket(anchor, apos, agram, emitted) =
            state.getOption.getOrElse(PointerBucket(Long.MaxValue, 0, Array.empty, 0))
          val out = Array.newBuilder[SubstringPointer]
          sorted.foreach { case (id, _, pos, tks) =>
            if (anchor != Long.MaxValue && id != anchor && emitted < maxEmitsPerFp) {
              // in-stream hash-collision guard: the arriving gram must
              // equal the stored anchor gram token-for-token
              val ok = pos + k - 1 <= tks.length &&
                agram.length == k &&
                (0 until k).forall(j => tks(pos - 1 + j) == agram(j))
              if (ok) {
                val (da, db, pa, pb) =
                  if (anchor < id) (anchor, id, apos, pos) else (id, anchor, pos, apos)
                out += SubstringPointer(da, db, pa, pb)
                emitted += 1
              }
            }
            if (id < anchor) {
              anchor = id; apos = pos
              agram = java.util.Arrays.copyOfRange(tks, pos - 1, pos - 1 + k)
            }
          }
          if (anchor != Long.MaxValue)
            state.update(PointerBucket(anchor, apos, agram, emitted))
          out.result().iterator
      }
  }

  /** A span to remove from an ARRIVING document: it shares `run_len` tokens
    * starting at `start` (1-based) with the fingerprint's anchor; `tks`
    * carries the arrival's own token array so the per-trigger rewrite
    * ([[spanRewrite]]) needs no second look at the corpus. One row per
    * (bucket, arrival) collision — a document with several shared regions
    * emits one span per region (from different buckets), aggregated
    * downstream.
    */
  final case class SubstringSpan(doc_id: Long, anchor: Long,
                                 start: Int, run_len: Int,
                                 tks: Array[String])

  /** The REMOVAL half of streaming substring dedup — the incremental form
    * of `dedup_substring_rewrite`: the same anchor-state verify+extend as
    * [[substringCandidates]], but oriented by ARRIVAL ORDER (the span drops
    * from the later arrival — the online keep-first rule; equal to the
    * batch id-order rule whenever ids arrive in order, which the spec
    * corpus pins). Emitted spans feed [[spanRewrite]] inside a
    * foreachBatch — a document's spans all emit in its own arrival batch
    * (its arrival is what triggers every collision), so per-trigger
    * aggregation sees the complete drop set; documents with no shared
    * region emit nothing and pass through unchanged (identity — the
    * online-cheap / offline-exact split as everywhere else).
    */
  def substringSpans(docs: DataFrame,
                     k: Int = graft.ops.TextQueries.WinnowK,
                     w: Int = graft.ops.TextQueries.WinnowW,
                     minLen: Int = -1,
                     maxEmitsPerFp: Int = 50,
                     ctxTokens: Int = 200): Dataset[SubstringSpan] = {
    val minL = if (minLen > 0) minLen else k + w - 1
    require(k >= 1 && w >= 1 && minL >= k && maxEmitsPerFp >= 1 && ctxTokens >= minL)
    val spark = docs.sparkSession
    import spark.implicits._
    winnowPositionRows(docs, k, w)
      .groupByKey(_._2)
      .flatMapGroupsWithState[SubstringBucket, SubstringSpan](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[SubstringBucket]) =>
          val sorted = rows.toArray.sortBy(r => (r._1, r._3))
          var SubstringBucket(anchor, apos, aoff, awin, emitted) =
            state.getOption.getOrElse(SubstringBucket(Long.MaxValue, 0, 0, Array.empty, 0))
          val out = Array.newBuilder[SubstringSpan]
          sorted.foreach { case (id, _, pos, tks) =>
            if (anchor != Long.MaxValue && id != anchor && emitted < maxEmitsPerFp) {
              // the ARRIVAL is always the drop side: extend its run vs the
              // anchor's bounded window, emit arrival-side doc coordinates
              verifyExtend(awin, apos - aoff, tks, pos, k).foreach { case (extL, extR) =>
                val runLen = extL + k + extR
                if (runLen >= minL) {
                  out += SubstringSpan(id, anchor, pos - extL, runLen, tks)
                  emitted += 1
                }
              }
            }
            if (id < anchor) {
              anchor = id; apos = pos
              val (wn, of) = anchorWindow(tks, pos, k, ctxTokens)
              awin = wn; aoff = of
            }
          }
          if (anchor != Long.MaxValue)
            state.update(SubstringBucket(anchor, apos, aoff, awin, emitted))
          out.result().iterator
      }
  }

  /** Per-trigger rewrite over a batch of [[SubstringSpan]] rows (the
    * foreachBatch body): union each document's spans into a drop set and
    * reassemble the survivors — the batch kernel's span semantics
    * (`dedupSubstringRewriteFrom`) applied to exactly the affected
    * documents. Every span row of a document carries the identical token
    * array, so `first(tks)` is value-deterministic.
    */
  def spanRewrite(spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // one aggregation builds both the drop SET (collect_set dedupes
    // overlapping spans) and the representative token array — no self-join
    spans
      .selectExpr("doc_id", "tks",
        "explode(sequence(start, start + run_len - 1)) AS p")
      .groupBy(col("doc_id"))
      .agg(first(col("tks")).as("tks"), collect_set(col("p")).as("drop"))
      .selectExpr("doc_id",
        "CAST(size(tks) AS INT) AS n_tokens",
        "CAST(size(drop) AS INT) AS n_removed",
        "array_join(filter(tks, (t, i) -> NOT array_contains(drop, i + 1)), ' ') AS text_clean")
  }

  /** The stateless winnow-positions build shared by [[substringCandidates]]
    * and [[substringSpans]]: (doc_id, fp, pos, tks) rows.
    */
  private def winnowPositionRows(docs: DataFrame, k: Int, w: Int)
      : Dataset[(Long, Long, Int, Array[String])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val toks = graft.ops.Tokenize.Whitespace.sql("text")
    docs
      .selectExpr("doc_id", s"graft_barrier($toks) AS tks")
      .filter(s"size(tks) >= ${k + w - 1}")
      .selectExpr("doc_id", "tks",
        s"graft_barrier(transform(sequence(1, size(tks) - ${k - 1}), " +
          s"i -> hash60(array_join(slice(tks, i, $k), ' ')))) AS hs")
      .selectExpr("doc_id", "tks",
        s"explode(array_distinct(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"i -> named_struct('fp', array_min(slice(hs, i, $w)), " +
          s"'pos', CAST(i - 1 + array_position(slice(hs, i, $w), array_min(slice(hs, i, $w))) AS INT))))) AS sel")
      .selectExpr("doc_id", "sel.fp AS fp", "sel.pos AS pos", "tks")
      .as[(Long, Long, Int, Array[String])]
  }

  /** Verify the anchor k-gram token-for-token and extend to the first
    * mismatch on each side; None when the gram fails verification (a hash
    * collision). Shared by the candidate and span operators.
    */
  private def verifyExtend(ta: Array[String], pa: Int,
                           tb: Array[String], pb: Int, k: Int): Option[(Int, Int)] = {
    val inBounds = pa + k - 1 <= ta.length && pb + k - 1 <= tb.length
    if (!inBounds || !(0 until k).forall(j => ta(pa - 1 + j) == tb(pb - 1 + j))) None
    else {
      var extL = 0
      while (pa - 1 - extL >= 1 && pb - 1 - extL >= 1 &&
        ta(pa - 2 - extL) == tb(pb - 2 - extL)) extL += 1
      var extR = 0
      while (pa + k + extR <= ta.length && pb + k + extR <= tb.length &&
        ta(pa + k - 1 + extR) == tb(pb + k - 1 + extR)) extR += 1
      Some((extL, extR))
    }
  }

  def winnowCandidates(docs: DataFrame, k: Int = graft.ops.TextQueries.WinnowK,
                       w: Int = graft.ops.TextQueries.WinnowW,
                       maxEmitsPerFp: Int = 50): Dataset[WinnowCandidate] = {
    require(k >= 1 && w >= 1 && maxEmitsPerFp >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val toks = graft.ops.Tokenize.Whitespace.sql("text")
    docs
      .selectExpr("doc_id", s"graft_barrier($toks) AS tks")
      .filter(s"size(tks) >= ${k + w - 1}")
      .selectExpr("doc_id",
        s"graft_barrier(transform(sequence(1, size(tks) - ${k - 1}), " +
          s"i -> hash60(array_join(slice(tks, i, $k), ' ')))) AS hs")
      .selectExpr("doc_id",
        s"explode(array_distinct(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"i -> array_min(slice(hs, i, $w))))) AS fp")
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[WinnowBucket, WinnowCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, rows, state: GroupState[WinnowBucket]) =>
          val ids = rows.map(_._1).toArray.distinct.sorted
          var WinnowBucket(anchor, emitted) =
            state.getOption.getOrElse(WinnowBucket(Long.MaxValue, 0))
          val out = Array.newBuilder[WinnowCandidate]
          ids.foreach { id =>
            if (anchor != Long.MaxValue && id != anchor && emitted < maxEmitsPerFp) {
              out += WinnowCandidate(id, anchor, fp)
              emitted += 1
            }
            if (id < anchor) anchor = id
          }
          if (anchor != Long.MaxValue) state.update(WinnowBucket(anchor, emitted))
          out.result().iterator
      }
  }
}
