package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline over `documents`:
  * deterministic stratified sampling and sequence packing.
  *
  * Both are expression-only (whole-stage codegen, no UDFs) and designed for
  * the 100 TB shape:
  *   - sampling is a map-side filter on a content-derived hash — no RNG
  *     state, no shuffle, bit-reproducible under task retries, repartitions
  *     and reruns (the property `Bernoulli sample via rand()` does NOT have);
  *   - packing shuffles once on the stratum key and does a per-stratum
  *     running sum — at real scale the stratum key is (lang, shard) so each
  *     partition's sort stays bounded.
  */
object CurationQueries {

  private val toks = Tokenize.Whitespace.sql("text") // pinned dial (see Tokenize)

  /** Deterministic per-document hash in [0, 100): the first 16 bits of
    * md5(doc_id), parsed portably (neither engine has the other's hex-parse
    * idiom, but both have 1-based `instr`) and reduced mod 100 — uniform to
    * within 36/65536 (+-0.02% absolute per rate). An earlier ascii-of-hex-
    * chars form only reached 256 of 65536 states and skewed the advertised
    * rates by up to 6 points (a "30%" stratum kept 23.8%).
    */
  private def hexDigit(src: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($src, $i, 1)) - 1)"
  /** First 16 bits of an md5-hex expression, reduced mod `m`. */
  private def hashModOf(md5expr: String, m: Int): String =
    s"((${hexDigit(md5expr, 1)} * 4096 + ${hexDigit(md5expr, 2)} * 256 + " +
      s"${hexDigit(md5expr, 3)} * 16 + ${hexDigit(md5expr, 4)}) % $m)"
  private def hashPctOf(key: String): String = hashModOf(s"md5($key)", 100)
  private val hashPct = hashPctOf("CAST(doc_id AS STRING)")

  /** The catalog's pinned per-language keep rates (percent): the
    * down/up-weighting step of a multilingual training mix.
    */
  val DefaultRates: (Map[String, Int], Int) =
    (Map("en" -> 10, "de" -> 30, "fr" -> 50), 70)

  /** Stratified sampling with per-language rates — keep-decision is a pure
    * function of the document key, so the sample is stable across reruns
    * and insensitive to data layout.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    sampleFrom(Tables(s, dir, "documents"))

  /** The sampling kernel over any frame with (doc_id, lang, source) — the
    * keep-decision depends only on row content, so the output set is
    * identical for any partitioning/ordering of `docs`. `rates` maps each
    * stratum to its keep percent; `default` covers unlisted strata.
    * The per-stratum threshold is built with the Column API (a `when` chain),
    * never by splicing stratum keys into SQL text: `rates` is caller-supplied,
    * and a key containing a quote must select a stratum, not break the parse.
    */
  def sampleFrom(docs: DataFrame,
                 rates: Map[String, Int] = DefaultRates._1,
                 default: Int = DefaultRates._2): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (l, r)) => when(col("lang") === lit(l), lit(r)).otherwise(acc)
    }
    docs.selectExpr("doc_id", "lang", "source", s"CAST($hashPct AS INT) AS h")
      .filter(col("h") < threshold)
  }

  /** Sequence packing: assign documents to token-budget packs (budget 2048
    * estimated BPE tokens) by OFFSET partitioning — documents ordered by
    * doc_id within a language stratum, `pack_id = floor(prefix_sum / 2048)`.
    * A document whose tokens straddle a boundary stays in the pack it
    * started in, so a pack can exceed the budget by at most one document's
    * tokens (the consumer splits the straddler or pads — the standard
    * concat-then-chunk tokenization layout). This is deliberately NOT
    * closed-form next-fit (which reopens a fresh pack for every straddler):
    * offset packing is a pure prefix-sum, so it parallelizes as one window
    * per stratum instead of a sequential fold. `pack_pos` is the document's
    * slot within its pack.
    */
  def packSequences(s: SparkSession, dir: String, budget: Long = 2048L,
                    strata: Seq[String] = Seq("lang"),
                    counter: BpeTokenizer.TokenCounter = BpeTokenizer.TokenCounter.Chars4): DataFrame =
    packTokens(
      counter.project(Tables(s, dir, "documents"), Seq("doc_id", "lang")),
      budget, strata)

  /** [[packSequences]] budgeting in REAL subword tokens — the
    * [[BpeTokenizer.TokenCounter.Bpe]] dial end-to-end: packs now hold
    * ~2048 tokenizer tokens, the unit the training job actually pays. The
    * pinned default everywhere else stays the chars/4 estimate so the
    * existing oracles are untouched; this entry's oracle swaps the n_tok
    * CTE for the generated BPE vocab chain.
    */
  def packSequencesBpe(s: SparkSession, dir: String, budget: Long = 2048L): DataFrame =
    packSequences(s, dir, budget, counter = BpeTokenizer.TokenCounter.Bpe)

  /** `doc_pack` budgeted in GPT-2-SHAPED tokens (pre-tokenizer pieces +
    * byte merges — [[BpeTokenizer.TokenCounter.Gpt2]]): the unit a
    * GPT-2-style training job actually pays, leading spaces included. The
    * oracle swaps the n_tok CTE for the generated piece/byte-merge chain.
    */
  def packSequencesGpt2(s: SparkSession, dir: String, budget: Long = 2048L): DataFrame =
    packSequences(s, dir, budget, counter = BpeTokenizer.TokenCounter.Gpt2)

  /** The packing kernel over any frame with (doc_id, <strata cols>, n_tok):
    * a prefix-sum window per stratum, `pack_id = floor(prefix_sum / budget)`,
    * then a slot number within each pack.
    *
    * `strata` is the 100 TB dial: the catalog's pinned default (`lang`) puts
    * a whole language stratum on ONE window task — fine at test scale, a
    * scale-killer on a real corpus where one language is most of the data.
    * A production run adds a shard sub-key (any deterministic bucketing
    * column, e.g. `pmod(hash(doc_id), 1024)`) so each window partition's
    * sort stays bounded; packing is then sequential *within each shard*
    * (each (stratum, shard) gets its own independent pack sequence), which
    * is exactly the concat-then-chunk layout a sharded tokenizer consumes.
    */
  def packTokens(docs: DataFrame, budget: Long = 2048L,
                 strata: Seq[String] = Seq("lang")): DataFrame = {
    require(budget > 0 && strata.nonEmpty)
    val parts = strata.map(col)
    val wSum = org.apache.spark.sql.expressions.Window
      .partitionBy(parts: _*).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(parts :+ col("pack_id"): _*).orderBy(col("doc_id"))
    docs
      .withColumn("__start_tok", sum(col("n_tok")).over(wSum) - col("n_tok"))
      // integer div, not floor(double /): token prefix sums at corpus scale
      // can exceed 2^53 where double division would misplace pack boundaries
      .withColumn("pack_id", expr(s"CAST(__start_tok div ${budget}L AS BIGINT)"))
      .drop("__start_tok")
      .withColumn("pack_pos", row_number().over(wPos).cast("int"))
  }

  /** The corpus-scale packing shape: stratum key (lang, shard), shard a
    * deterministic bucket of doc_id — each window partition's sort stays
    * bounded at 100 TB instead of one language landing on one task. Packing
    * is sequential within each (lang, shard); the catalog pins `shards = 4`
    * so the DuckDB oracle gates the sharded semantics end-to-end.
    */
  def packSequencesSharded(s: SparkSession, dir: String, budget: Long = 2048L,
                           shards: Int = 4,
                           counter: BpeTokenizer.TokenCounter = BpeTokenizer.TokenCounter.Chars4): DataFrame = {
    require(shards > 0)
    packTokens(
      counter.project(
        Tables(s, dir, "documents")
          .selectExpr("doc_id", "lang", s"CAST(pmod(doc_id, $shards) AS BIGINT) AS shard", "text"),
        Seq("doc_id", "lang", "shard")),
      budget, Seq("lang", "shard"))
  }

  /** The catalog's pinned per-language emission rates (percent of one
    * epoch): 35 = downsample to 0.35x, 100 = keep, 170 = 1.7x (every doc
    * once, 70% twice), 250 = 2.5x. One of each regime so the oracle gates
    * all three branches of the fractional-repeat arithmetic.
    */
  val DefaultUpsampleRates: (Map[String, Int], Int) =
    (Map("en" -> 35, "de" -> 100, "fr" -> 170), 250)

  /** Mixture upsampling: emit each document `rate/100` times plus one more
    * when its hash falls under the fractional remainder — the reweighting
    * step that turns a mix report's target shares into an epoch stream.
    */
  def upsample(s: SparkSession, dir: String): DataFrame =
    upsampleFrom(Tables(s, dir, "documents"))

  /** The upsampling kernel over any frame with (doc_id, lang, source).
    * `rates` maps a stratum to its emission rate in percent (>= 0; < 100
    * downsamples, >= 100 repeats); `default` covers unlisted strata. The
    * copy count is a pure function of row content — `floor(rate/100)` plus
    * one more when the document's hash percent falls below `rate % 100` —
    * so the epoch stream is bit-reproducible under retries, repartitions
    * and reruns, and E[copies] = rate/100 exactly (up to the 16-bit hash
    * granularity). The hash is salted ('up:') so the keep-decision is
    * independent of [[sampleFrom]]'s — a doc surviving sampling is not
    * thereby biased toward an extra upsample copy. Pure map-side: no
    * shuffle, no RNG state, scales linearly with the corpus at 100 TB.
    * The rate threshold is built with the Column API, never spliced into
    * SQL text (caller-supplied keys must select, not parse).
    */
  def upsampleFrom(docs: DataFrame,
                   rates: Map[String, Int] = DefaultUpsampleRates._1,
                   default: Int = DefaultUpsampleRates._2): DataFrame = {
    require(default >= 0 && rates.values.forall(_ >= 0), "rates are percents >= 0")
    // cap the per-row explode: a fat-fingered rate (1e9% = 10M copies per
    // doc) would amplify the corpus map-side before anything could push
    // back; 10000% (100 copies) is beyond any sane mixture weight
    require(default <= 10000 && rates.values.forall(_ <= 10000),
      "rates are percents <= 10000 (100 copies)")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (l, r)) => when(col("lang") === lit(l), lit(r)).otherwise(acc)
    }
    val hUp = hashPctOf("concat('up:', CAST(doc_id AS STRING))")
    docs
      .select(col("doc_id"), col("lang"), col("source"), rate.as("rate"))
      .withColumn("copies",
        expr("CAST(rate div 100 AS BIGINT)") +
          when(expr(s"$hUp") < col("rate") % 100, 1L).otherwise(0L))
      .filter(col("copies") > 0) // sequence(0, -1) would DESCEND, not empty
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr("sequence(CAST(0 AS BIGINT), copies - 1)")).as("epoch"))
  }

  /** Deterministic corpus shuffle into training splits: every document is
    * assigned a split by content hash and a dense within-split position in
    * hash order — the "shuffle your training data" step, reproducible
    * across reruns (no RNG, no layout sensitivity). One shuffle on
    * `split_id`; each split's sort is corpus/splits, so a production run
    * sets `splits` to its output shard count (thousands) and every window
    * partition stays bounded — the same dial as [[packTokens]]' strata.
    * The order key is the full md5 (salted 'shuf:', independent of the
    * sampling and upsampling hashes), doc_id-tiebroken.
    */
  def shuffleSplit(s: SparkSession, dir: String, splits: Int = 8): DataFrame =
    shuffleSplitFrom(Tables(s, dir, "documents"), splits)

  /** The shuffle kernel over any frame with (doc_id, lang). */
  def shuffleSplitFrom(docs: DataFrame, splits: Int = 8): DataFrame = {
    // the split assignment reads 16 hash bits: beyond 2^16 splits the
    // distribution silently skews (and 65536 output shards of a corpus is
    // already one shard per ~1.5 GB at 100 TB)
    require(splits > 0 && splits <= 65536, "splits in [1, 65536] (16-bit hash)")
    val h = "md5(concat('shuf:', CAST(doc_id AS STRING)))"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split_id")).orderBy(col("hk"), col("doc_id"))
    docs
      .selectExpr("doc_id", "lang", s"$h AS hk",
        s"CAST(${hashModOf(h, splits)} AS INT) AS split_id")
      .withColumn("seq", row_number().over(w).cast("int"))
      .select(col("doc_id"), col("lang"), col("split_id"), col("seq"))
  }

  /** Cluster-aware train/test split — the leakage-proof variant of
    * [[shuffleSplitFrom]]. A per-document hash split puts two NEAR-DUPLICATE
    * documents in different splits with probability (splits−1)/splits: the
    * classic eval-contamination path (the held-out split "novel" document
    * has a training-set twin). Here the split key is the document's
    * transitive near-dup cluster id ([[DedupQueries.dedupClusters]]), so
    * every duplicate group travels as one unit — a pair straddling
    * train/test cannot exist by construction (pinned end-to-end in
    * Round8Spec against the verified pair stream). Singleton clusters (the
    * overwhelming majority) hash exactly like documents, so balance matches
    * the per-document split asymptotically. One extra shuffle over the
    * cluster resolution it composes.
    */
  def splitGrouped(s: SparkSession, dir: String, splits: Int = 8): DataFrame = {
    require(splits > 0 && splits <= 65536, "splits in [1, 65536] (16-bit hash)")
    val h = "md5(concat('gsplit:', CAST(cluster_id AS STRING)))"
    DedupQueries.dedupClusters(s, dir).selectExpr(
      "doc_id", "cluster_id", s"CAST(${hashModOf(h, splits)} AS INT) AS split_id")
  }

  /** SOFT dedup — duplicate-count REWEIGHTING instead of removal: every
    * document keeps its row but carries weight 1/|cluster| from the
    * transitive near-dup resolution, so a passage duplicated k times
    * contributes exactly one copy's worth of expected training mass under
    * weighted sampling (the reweighting alternative the semantic-dedup
    * literature prefers when hard removal is too blunt — duplicates often
    * carry distinct metadata worth keeping). Composes [[DedupQueries.dedupClusters]]
    * with one cluster-keyed count join; the weight is a single IEEE
    * division of exact integers — deterministic in both engines. Feeds
    * [[graft.ops.BpeTokenizer.TokenCounter]]-style samplers directly
    * (weight x token count = the PPS measure).
    */
  def dedupWeights(s: SparkSession, dir: String): DataFrame = {
    val clusters = DedupQueries.dedupClusters(s, dir)
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("cluster_id"))
      .selectExpr("doc_id", "cluster_id", "cluster_size",
        "CAST(1 AS DOUBLE) / cluster_size AS weight")
  }

  /** The end-to-end curation funnel: one per-document verdict combining the
    * three filters a production corpus actually chains — near-dup removal,
    * model-based quality, and repetition — with per-stage pass flags so the
    * attrition report is one groupBy over the output.
    *
    * Stages (first failure names the verdict):
    *   1. `near_dup` — the document is the LATER member of a verified
    *      MinHash-LSH near-dup pair ([[DedupQueries.minhashLsh]]; "keep the
    *      earliest copy" — the pairwise approximation of cluster
    *      survivorship; [[DedupQueries.dedupClusters]] is the transitive
    *      version when dup chains matter).
    *   2. `low_quality` — mean hashed-model weight per token below
    *      `minScoreX10 / 10` ([[TextQueries.scoreRawSql]]; exact-int test:
    *      `score_raw * 10 >= minScoreX10 * n_tokens`).
    *   3. `repetitive` — most frequent token above `maxTopPct`% of the doc
    *      ([[TextQueries.maxTokNSql]]).
    *
    * Scale shape: scoring is map-side over the corpus; the dup-id side is
    * the near-dup set — proportional to the corpus dup rate, so it is NOT
    * broadcast (a left equi-join AQE can still broadcast when it turns out
    * small). The pair generation inside minhashLsh is the banded join the
    * gate already validates, with its barriers Lifecycle-released.
    */
  def curate(s: SparkSession, dir: String,
             minScoreX10: Long = -150L, maxTopPct: Long = 20L): DataFrame = {
    val dups = DedupQueries.minhashLsh(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(1))
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "lang",
        s"size($toks) AS n_tokens",
        s"${TextQueries.scoreRawSql} AS score_raw",
        s"${TextQueries.maxTokNSql} AS max_tok_n")
      .join(dups, Seq("doc_id"), "left")
      .selectExpr("doc_id", "lang",
        "CAST(IF(is_dup IS NULL, 1, 0) AS INT) AS pass_dedup",
        s"CAST(IF(score_raw * 10 >= $minScoreX10 * n_tokens, 1, 0) AS INT) AS pass_model",
        s"CAST(IF(max_tok_n * 100 <= $maxTopPct * n_tokens, 1, 0) AS INT) AS pass_rep")
      .selectExpr("doc_id", "lang", "pass_dedup", "pass_model", "pass_rep",
        """CASE WHEN pass_dedup = 0 THEN 'near_dup'
          |     WHEN pass_model = 0 THEN 'low_quality'
          |     WHEN pass_rep = 0 THEN 'repetitive'
          |     ELSE 'keep' END AS verdict""".stripMargin)
  }

  /** Training-mix report: per (lang, source) document counts, exact token
    * sums, and each cell's share of the corpus token budget — the dashboard
    * a data-mixture owner watches when reweighting sources. One partial+final
    * aggregation over the corpus; the share window runs over the
    * cardinality-bounded aggregate (|langs|x|sources| rows), not the data.
    * The share division is exact-int / exact-int — bit-identical across
    * engines.
    */
  def mixReport(s: SparkSession, dir: String,
                counter: BpeTokenizer.TokenCounter = BpeTokenizer.TokenCounter.Chars4): DataFrame =
    counter.project(Tables(s, dir, "documents"), Seq("doc_id", "lang", "source"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .selectExpr("lang", "source", "n_docs", "n_tokens",
        "CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share")

  /** The catalog's pinned per-language target token shares (they sum to 1
    * with the 0.125 default covering each unlisted language).
    */
  val DefaultTargetShares: (Map[String, Double], Double) =
    (Map("en" -> 0.3, "de" -> 0.25, "fr" -> 0.2), 0.125)

  /** Mixture-rate derivation — the arithmetic that CLOSES the curation
    * loop: [[mixReport]] measures the actual token share per language,
    * this op divides the TARGET share by it and emits the emission rate
    * (percent) that [[upsampleFrom]] consumes. Run report -> rates ->
    * upsample and the next epoch lands on the target mixture.
    *
    * One partial+final aggregate over the corpus; the share window and the
    * rate arithmetic run over the |langs|-row aggregate. The rate is
    * `round(target / actual * 100)` — the IEEE chain is identical in both
    * engines (same division structure, same half-away-from-zero round), so
    * the derived integer rate is bit-stable.
    */
  def mixRates(s: SparkSession, dir: String,
               targets: Map[String, Double] = DefaultTargetShares._1,
               default: Double = DefaultTargetShares._2,
               counter: BpeTokenizer.TokenCounter = BpeTokenizer.TokenCounter.Chars4): DataFrame = {
    require(default > 0 && targets.values.forall(_ > 0), "target shares are positive")
    val target = targets.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (l, t)) => when(col("lang") === lit(l), lit(t)).otherwise(acc)
    }
    counter.project(Tables(s, dir, "documents"), Seq("doc_id", "lang"))
      .groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      // a lang whose docs are all empty has share 0 and no finite rate —
      // drop it (it contributes no tokens to any mixture) instead of
      // emitting round(Infinity); mirrored in the oracle
      .filter(col("n_tokens") > 0)
      .selectExpr("lang", "n_tokens",
        "CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS actual_share")
      .withColumn("target_share", target)
      .withColumn("rate_pct",
        expr("CAST(round(target_share / actual_share * 100) AS BIGINT)"))
  }

  /** Context-window chunking — the other half of sequence assembly next to
    * [[packSequences]]: packing concatenates SHORT docs up to the context
    * budget; chunking splits LONG docs into overlapping training windows
    * (chunk k = tokens [k·stride, k·stride + chunkTokens)), the standard
    * sliding-window pass before tokenized-example emission. Overlap =
    * chunkTokens − stride tokens carries context across window boundaries.
    *
    * Scale shape: a pure per-row generator expression — no shuffle, no
    * window, no state; embarrassingly parallel at 100 TB and the output
    * inherits the input partitioning. The final short chunk is emitted
    * as-is (never padded, never silently dropped).
    */
  val ChunkTokens = 50
  val ChunkStride = 40
  def docChunk(s: SparkSession, dir: String,
               chunkTokens: Int = ChunkTokens, stride: Int = ChunkStride): DataFrame =
    docChunkFrom(Tables(s, dir, "documents"), chunkTokens, stride)

  /** The chunking kernel over any frame with (doc_id, text). */
  def docChunkFrom(docs: DataFrame,
                   chunkTokens: Int = ChunkTokens, stride: Int = ChunkStride): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      "need chunkTokens >= stride >= 1 (gaps would silently drop tokens)")
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    // tokens behind an expression barrier: textually-inlined split inside
    // the slice lambda re-runs per chunk (interpreted HOF, no codegen CSE)
    docs
      .selectExpr("doc_id", s"graft_barrier($toks) AS tks")
      .selectExpr(
        "doc_id",
        s"posexplode(transform(" +
          s"sequence(0, CAST(ceil(size(tks) / CAST($stride AS DOUBLE)) AS INT) - 1), " +
          s"i -> array_join(slice(tks, i * $stride + 1, $chunkTokens), ' '))) AS (chunk_idx, chunk)")
      .selectExpr("doc_id", "chunk_idx", "chunk",
        "size(split(chunk, ' ')) AS n_tokens")
  }

  /** Context-window chunking in REAL subword tokens — [[docChunk]] splits
    * by word count; a training job's context limit is TOKENIZER tokens, so
    * this variant budgets each chunk at `budgetTokens` BPE subwords
    * ([[BpeTokenizer.PinnedMerges]]): per-word subword counts from the
    * vocabulary join, an in-document prefix sum, and the same OFFSET
    * boundary rule as [[packTokens]] (a word straddling the budget stays in
    * the chunk it started in — prefix-sum parallelizable, never a
    * sequential fold). Non-overlapping (stride = budget): the overlap dial
    * belongs to word-window chunking; token-budget chunking is the
    * concat-then-chunk layout.
    *
    * Scale shape: one vocab-sized BPE application + a per-document window
    * over word positions (bounded by doc length) + one groupBy — linear,
    * and the window partitions by doc_id so no stratum lands on one task.
    */
  val ChunkBpeTokens = 64L
  def docChunkBpe(s: SparkSession, dir: String,
                  budgetTokens: Long = ChunkBpeTokens): DataFrame = {
    require(budgetTokens >= 1)
    val toksSql = Tokenize.Whitespace.sql("text")
    val tok = Tables(s, dir, "documents")
      .selectExpr("doc_id", s"posexplode($toksSql) AS (pos, w)")
    val wSum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    tok.join(BpeTokenizer.applyWords(tok.select(col("w")).distinct()), Seq("w"))
      .withColumn("__start", sum(col("n_sub")).over(wSum) - col("n_sub"))
      .withColumn("chunk_idx", expr(s"CAST(__start div ${budgetTokens}L AS INT)"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, w))), x -> x.w), ' ')")
          .as("chunk"),
        count(lit(1)).cast("int").as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"))
  }

  /** Percentile-threshold quality filtering — the form quality cutoffs
    * actually take in production ("drop the bottom decile by model score"):
    * static thresholds go stale as the corpus shifts, a quantile tracks it.
    * Two bounded passes: the exact interpolated percentile of the model
    * score (one partial+final aggregate — constant-size state per
    * partition), broadcast back as a 1-row frame, then a map-side filter.
    * The score is [[TextQueries.qualityModelFrom]]'s exact-int model
    * (single IEEE division per doc), and the threshold arithmetic matches
    * DuckDB's `quantile_cont` bit-for-bit (same machinery as
    * `q_percentiles`) — so even the >= comparison at the cut line is
    * engine-independent.
    */
  def filterQuantile(s: SparkSession, dir: String, pct: Double = 0.10): DataFrame = {
    require(pct > 0 && pct < 1)
    val scored = TextQueries.qualityModelFrom(Tables(s, dir, "documents"))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val thr = scored.agg(expr(s"percentile(score, $pct)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("score") >= col("thr"))
  }

  /** Fixed-QUOTA stratified sampling — exactly `quota` docs per stratum
    * (rate-based [[sampleStratified]] yields binomially-varying counts; an
    * eval-set builder or per-language cap wants exact counts). Deterministic
    * rank by content hash (md5 of the doc key — layout-independent, no RNG
    * state), tie-broken by doc_id, so the sample is stable under
    * repartition/rerun like the rate sampler. One shuffle on the stratum
    * key; the per-stratum window sorts only that stratum's rows — fine at
    * test scale, but a whole language on ONE window task at corpus scale:
    * [[sampleQuotaSharded]] is the 100 TB variant (the same shard sub-key
    * dial `doc_pack` has), or pre-filter with the rate sampler to ~2x the
    * quota and quota-cut the survivors.
    */
  def sampleQuota(s: SparkSession, dir: String, quota: Int = 40): DataFrame = {
    require(quota > 0)
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "lang", "source",
        "md5(concat('quota:', CAST(doc_id AS STRING))) AS hk")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= quota)
      .select(col("doc_id"), col("lang"), col("source"), col("rk").cast("int").as("rk"))
  }

  /** The corpus-scale quota shape: the per-language quota is split evenly
    * over `shards` deterministic sub-buckets of the doc key, and the rank
    * window partitions by (lang, shard) — each window task sorts 1/shards of
    * a stratum instead of the whole language, the exact dial
    * [[packSequencesSharded]] ships for packing. Per-(lang, shard) quotas
    * sum to the target when every cell holds at least quota/shards docs (a
    * sparse cell under-fills, exactly as the unsharded sampler does on a
    * sparse stratum); the union is still hash-ranked and deterministic
    * (layout-independent, stable under rerun). The sample differs from
    * [[sampleQuota]]'s by construction (ranking within shards ≠ global
    * ranking) — that is the documented trade for unbounded parallelism; a
    * production run sets `shards` to O(cluster cores).
    */
  def sampleQuotaSharded(s: SparkSession, dir: String,
                         quota: Int = 40, shards: Int = 4): DataFrame = {
    require(quota > 0 && shards > 0, "need quota > 0 and shards > 0")
    require(quota % shards == 0,
      s"quota ($quota) must divide evenly over shards ($shards) so per-shard quotas sum to the target")
    val perShard = quota / shards
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "lang", "source",
        s"CAST(pmod(doc_id, $shards) AS BIGINT) AS shard",
        "md5(concat('quota:', CAST(doc_id AS STRING))) AS hk")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"), col("shard"))
          .orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= perShard)
      .select(col("doc_id"), col("lang"), col("source"), col("shard"),
        col("rk").cast("int").as("rk"))
  }

  /** Weighted (probability-proportional-to-size) systematic sampling: every
    * document's inclusion probability is proportional to its token count —
    * the sampler a token-budgeted eval set or a "sample 1 % of the TOKENS,
    * not 1 % of the docs" request needs (uniform doc sampling over-weights
    * short documents token-wise). Classic systematic PPS: lay the documents
    * on a line in content-hash order (the hash is the shuffle — layout-
    * independent, no RNG state), each occupying its token weight, and
    * select every document whose interval crosses a multiple of
    * `step = total_tokens div target`. All arithmetic is exact integers,
    * so both engines pick the identical sample; docs heavier than `step`
    * are always selected (the PPS certainty stratum).
    *
    * Scale: the global prefix sum is partition-parallel — range-partition
    * on the hash order, a local running sum per partition, then the
    * per-partition token totals (one row per task) carry cumulative offsets
    * back by broadcast join. No single-partition window anywhere; the same
    * boundary-carry discipline as q_skyline / q_rfm's parallelRank.
    */
  def sampleWeighted(s: SparkSession, dir: String, target: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    require(target > 0)
    val w = Tables(s, dir, "documents")
      .selectExpr("doc_id", "(length(text) + 3) div 4 AS tokens", "md5(text) AS h")
    val ranged = w.repartitionByRange(col("h"), col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds the rows AND the offsets
    val localW = Window.partitionBy(col("__pid")).orderBy(col("h"), col("doc_id"))
    val local = ranged.withColumn("__cum", sum(col("tokens")).over(localW))
    // one row per partition: offsets and the grand total off one tiny frame
    val perPart = ranged.groupBy(col("__pid")).agg(sum(col("tokens")).as("__n"))
    val offW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = perPart
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val tot = perPart.agg(sum(col("__n")).as("__tot"))
    val out = local.join(broadcast(offs), "__pid")
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("__off") + col("__cum"))
      .withColumn("__step", greatest(expr(s"__tot div $target"), lit(1L)))
      .filter(expr("(cum div __step) > ((cum - tokens) div __step)"))
      .select(col("doc_id"), col("tokens").cast("bigint").as("tokens"),
        col("cum").cast("bigint").as("cum"))
    Lifecycle.released(out, ranged)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_sample_weighted" -> ((s, dir) => sampleWeighted(s, dir)),
    "doc_sample_quota" -> ((s, dir) => sampleQuota(s, dir)),
    "doc_sample_quota_sharded" -> ((s, dir) => sampleQuotaSharded(s, dir)),
    "doc_filter_quantile" -> ((s, dir) => filterQuantile(s, dir)),
    "doc_chunk" -> ((s, dir) => docChunk(s, dir)),
    "doc_chunk_bpe" -> ((s, dir) => docChunkBpe(s, dir)),
    "doc_sample_stratified" -> sampleStratified,
    "doc_pack" -> ((s, dir) => packSequences(s, dir)),
    "doc_pack_bpe" -> ((s, dir) => packSequencesBpe(s, dir)),
    "doc_pack_gpt2" -> ((s, dir) => packSequencesGpt2(s, dir)),
    "doc_pack_sharded" -> ((s, dir) => packSequencesSharded(s, dir)),
    "doc_mix_report" -> ((s, dir) => mixReport(s, dir)),
    "doc_mix_rates" -> ((s, dir) => mixRates(s, dir)),
    "doc_upsample" -> upsample,
    "doc_shuffle_split" -> ((s, dir) => shuffleSplit(s, dir)),
    "doc_split_grouped" -> ((s, dir) => splitGrouped(s, dir)),
    "doc_dedup_weights" -> dedupWeights,
    "doc_curate" -> ((s, dir) => curate(s, dir)),
  )

  private val duckToks = s"regexp_split_to_array(trim(text), '[${Tokenize.WsClass}]+')"

  val oracleSql: Map[String, String] = Map(
    // exact-integer systematic PPS: select where the token interval
    // crosses a multiple of step = total // target
    "doc_sample_weighted" ->
      """WITH w AS (
        |  SELECT doc_id, (length(text) + 3) // 4 AS tokens, md5(text) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tokens,
        |    sum(tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
        |    greatest(sum(tokens) OVER () // 100, 1) AS step
        |  FROM w)
        |SELECT doc_id, CAST(tokens AS BIGINT) AS tokens, CAST(cum AS BIGINT) AS cum
        |FROM c
        |WHERE (cum // step) > ((cum - tokens) // step)""".stripMargin,
    "doc_sample_quota" ->
      """SELECT doc_id, lang, source, CAST(rk AS INT) AS rk FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 40""".stripMargin,
    "doc_sample_quota_sharded" ->
      """SELECT doc_id, lang, source, shard, CAST(rk AS INT) AS rk FROM (
        |  SELECT doc_id, lang, source, CAST(doc_id % 4 AS BIGINT) AS shard,
        |    row_number() OVER (PARTITION BY lang, doc_id % 4
        |      ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 10""".stripMargin,
    "doc_filter_quantile" ->
      s"""WITH sc AS (
         |  SELECT doc_id, ${TextQueries.duckNTokensSql} AS n_tokens,
         |    CASE WHEN ${TextQueries.duckNTokensSql} = 0 THEN CAST(0.0 AS DOUBLE)
         |         ELSE CAST(${TextQueries.duckScoreRawSql} AS DOUBLE) / ${TextQueries.duckNTokensSql}
         |    END AS score
         |  FROM documents),
         |t AS (SELECT quantile_cont(score, 0.10) AS thr FROM sc)
         |SELECT doc_id, n_tokens, score, thr FROM sc, t WHERE score >= thr""".stripMargin,
    "doc_chunk" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents)
        |SELECT doc_id,
        |  CAST(unnest(range(0, CAST(ceil(len(t) / 40.0) AS INT))) AS INT) AS chunk_idx,
        |  unnest(list_transform(range(0, CAST(ceil(len(t) / 40.0) AS INT)),
        |    i -> array_to_string(t[i * 40 + 1 : i * 40 + 50], ' '))) AS chunk,
        |  CAST(unnest(list_transform(range(0, CAST(ceil(len(t) / 40.0) AS INT)),
        |    i -> len(t[i * 40 + 1 : i * 40 + 50]))) AS INT) AS n_tokens
        |FROM tok""".stripMargin,
    "doc_sample_stratified" ->
      s"""SELECT doc_id, lang, source, CAST(h AS INT) AS h FROM (
         |  SELECT doc_id, lang, source,
         |    ${hashPctOf("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents) t
         |WHERE h < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 30 WHEN 'fr' THEN 50 ELSE 70 END""".stripMargin,
    "doc_mix_rates" ->
      s"""WITH toks AS (
         |  SELECT lang,
         |    CAST(list_sum(list_transform($duckToks, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_tok
         |  FROM documents),
         |agg AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM toks
         |        GROUP BY 1 HAVING sum(n_tok) > 0)
         |SELECT lang, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS actual_share,
         |  CAST(CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.2 ELSE 0.125 END AS DOUBLE) AS target_share,
         |  CAST(round(CAST(CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.2 ELSE 0.125 END AS DOUBLE)
         |    / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()) * 100) AS BIGINT) AS rate_pct
         |FROM agg""".stripMargin,
    "doc_mix_report" ->
      s"""WITH toks AS (
         |  SELECT lang, source,
         |    CAST(list_sum(list_transform($duckToks, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_tok
         |  FROM documents),
         |agg AS (
         |  SELECT lang, source, CAST(count(1) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM toks GROUP BY 1, 2)
         |SELECT lang, source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share
         |FROM agg""".stripMargin,
    "doc_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    CAST(list_sum(list_transform($duckToks, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_tok
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 2048 AS BIGINT) AS pack_id
         |  FROM toks)
         |SELECT doc_id, lang, n_tok, pack_id,
         |  CAST(row_number() OVER (PARTITION BY lang, pack_id ORDER BY doc_id) AS INT) AS pack_pos
         |FROM packed""".stripMargin,
    // word positions + per-word subword counts + in-doc offset boundaries
    "doc_chunk_bpe" ->
      ("WITH " + BpeTokenizer.applyCtes() + s""",
         |wpos AS (
         |  SELECT doc_id, unnest(t) AS w, CAST(unnest(range(0, len(t))) AS INT) AS pos
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '[${Tokenize.WsClass}]+') AS t FROM documents) z),
         |j AS (SELECT p.doc_id, p.pos, p.w, c.n_sub FROM wpos p JOIN bpe_wc c USING (w)),
         |b AS (SELECT doc_id, pos, w, n_sub,
         |  CAST((sum(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_sub) // 64 AS INT) AS chunk_idx
         |  FROM j)
         |SELECT doc_id, chunk_idx, string_agg(w, ' ' ORDER BY pos) AS chunk,
         |  CAST(count(1) AS INT) AS n_words, CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
         |FROM b GROUP BY 1, 2""".stripMargin),
    // doc_pack with the n_tok CTE swapped for the generated BPE vocab chain
    "doc_pack_bpe" ->
      ("WITH " + BpeTokenizer.applyCtes() + s""",
         |toks AS (
         |  SELECT t.doc_id, any_value(t.lang) AS lang, CAST(sum(c.n_sub) AS BIGINT) AS n_tok
         |  FROM btok t JOIN bpe_wc c USING (w) GROUP BY t.doc_id),
         |packed AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 2048 AS BIGINT) AS pack_id
         |  FROM toks)
         |SELECT doc_id, lang, n_tok, pack_id,
         |  CAST(row_number() OVER (PARTITION BY lang, pack_id ORDER BY doc_id) AS INT) AS pack_pos
         |FROM packed""".stripMargin),
    // doc_pack budgeted in GPT-2-shaped tokens: the n_tok CTE swapped for
    // the generated piece/byte-merge chain
    "doc_pack_gpt2" ->
      ("WITH " + BpeTokenizer.gpt2ApplyCtes + s""",
         |toks AS (
         |  SELECT t.doc_id, any_value(t.lang) AS lang, CAST(sum(c.n_sub) AS BIGINT) AS n_tok
         |  FROM btok t JOIN bpe_wc c USING (w) GROUP BY t.doc_id),
         |packed AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 2048 AS BIGINT) AS pack_id
         |  FROM toks)
         |SELECT doc_id, lang, n_tok, pack_id,
         |  CAST(row_number() OVER (PARTITION BY lang, pack_id ORDER BY doc_id) AS INT) AS pack_pos
         |FROM packed""".stripMargin),
    "doc_pack_sharded" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, CAST(doc_id % 4 AS BIGINT) AS shard,
         |    CAST(list_sum(list_transform($duckToks, t -> (length(t) + 3) // 4)) AS BIGINT) AS n_tok
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, lang, shard, n_tok,
         |    CAST((sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 2048 AS BIGINT) AS pack_id
         |  FROM toks)
         |SELECT doc_id, lang, shard, n_tok, pack_id,
         |  CAST(row_number() OVER (PARTITION BY lang, shard, pack_id ORDER BY doc_id) AS INT) AS pack_pos
         |FROM packed""".stripMargin,
    "doc_upsample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    CASE lang WHEN 'en' THEN 35 WHEN 'de' THEN 100 WHEN 'fr' THEN 170 ELSE 250 END AS rate,
         |    ${hashPctOf("'up:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, source,
         |    rate // 100 + CASE WHEN h < rate % 100 THEN 1 ELSE 0 END AS copies
         |  FROM d)
         |SELECT doc_id, lang, source, CAST(unnest(range(0, copies)) AS BIGINT) AS epoch
         |FROM c""".stripMargin,
    "doc_curate" ->
      s"""WITH pairs AS (${DedupQueries.minhashLshPairsSql}),
         |dups AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
         |scored AS (
         |  SELECT doc_id, lang,
         |    ${TextQueries.duckNTokensSql} AS n_tokens,
         |    ${TextQueries.duckScoreRawSql} AS score_raw,
         |    ${TextQueries.duckMaxTokNSql} AS max_tok_n
         |  FROM documents),
         |flags AS (
         |  SELECT s.doc_id, s.lang,
         |    CAST(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END AS INT) AS pass_dedup,
         |    CAST(CASE WHEN score_raw * 10 >= -150 * n_tokens THEN 1 ELSE 0 END AS INT) AS pass_model,
         |    CAST(CASE WHEN max_tok_n * 100 <= 20 * n_tokens THEN 1 ELSE 0 END AS INT) AS pass_rep
         |  FROM scored s LEFT JOIN dups d ON s.doc_id = d.doc_id)
         |SELECT doc_id, lang, pass_dedup, pass_model, pass_rep,
         |  CASE WHEN pass_dedup = 0 THEN 'near_dup'
         |       WHEN pass_model = 0 THEN 'low_quality'
         |       WHEN pass_rep = 0 THEN 'repetitive'
         |       ELSE 'keep' END AS verdict
         |FROM flags""".stripMargin,
    // the cluster resolution is dedup_clusters' own oracle, nested as a
    // subquery; the split hash then reads the CLUSTER id
    // soft dedup: 1/|cluster| weights over the nested cluster resolution
    "doc_dedup_weights" ->
      s"""SELECT doc_id, cluster_id,
         |  CAST(count(1) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
         |  CAST(1 AS DOUBLE) / count(1) OVER (PARTITION BY cluster_id) AS weight
         |FROM (
         |${DedupQueries.oracleSql("dedup_clusters")}
         |) c""".stripMargin,
    "doc_split_grouped" ->
      s"""SELECT doc_id, cluster_id,
         |  CAST(${hashModOf("md5('gsplit:' || CAST(cluster_id AS VARCHAR))", 8)} AS INT) AS split_id
         |FROM (
         |${DedupQueries.oracleSql("dedup_clusters")}
         |) c""".stripMargin,
    "doc_shuffle_split" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hk
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, lang, hk, CAST(${hashModOf("hk", 8)} AS INT) AS split_id
         |  FROM d)
         |SELECT doc_id, lang, split_id,
         |  CAST(row_number() OVER (PARTITION BY split_id ORDER BY hk, doc_id) AS INT) AS seq
         |FROM s""".stripMargin,
  )
}
