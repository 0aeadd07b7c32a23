package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  * Everything is expression-level (whole-stage codegen, no UDFs) and
  * partition-parallel — no driver state, scales linearly with the corpus.
  */
object TextQueries {

  /** The shared token fragment at the pinned [[Tokenize.Whitespace]]
    * default — kernels that take a [[Tokenizer]] dial derive the same
    * fragment from their argument.
    */
  private val toks = Tokenize.Whitespace.sql("text")

  /** Token statistics per document. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    tokenStatsFrom(Tables(s, dir, "documents"))

  /** The token-statistics kernel over any frame with (doc_id, text);
    * `tok` is the tokenizer dial (see [[Tokenize]] — whitespace is the
    * pinned catalog default, UnicodeWords the multilingual-crawl setting).
    */
  def tokenStatsFrom(docs: DataFrame,
                     tok: Tokenizer = Tokenize.Whitespace): DataFrame = {
    val tk = tok.sql("text")
    docs.selectExpr(
      "doc_id",
      s"size($tk) AS n_tokens",
      s"size(array_distinct($tk)) AS n_distinct_tokens",
      "length(text) AS n_chars_computed",
      s"CAST(aggregate($tk, 0L, (acc, t) -> acc + length(t)) AS BIGINT) AS total_token_chars",
      // BPE-ish token estimate: ~1 piece per 4 chars per word, exact-integer
      s"CAST(aggregate($tk, 0L, (acc, t) -> acc + (length(t) + 3) div 4) AS BIGINT) AS est_bpe_tokens")
  }

  /** Quality signals: exact integer counts (length, digits, punctuation,
    * stopwords) plus a coarse quality bucket.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").selectExpr(
      "doc_id",
      "length(text) AS n_chars",
      s"size($toks) AS n_tokens",
      s"size(filter($toks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS n_stop",
      "length(text) - length(regexp_replace(text, '[0-9]', '')) AS n_digits",
      "length(text) - length(regexp_replace(text, '[.,;:!?]', '')) AS n_punct")
      .selectExpr("doc_id", "n_chars", "n_tokens", "n_stop", "n_digits", "n_punct",
        """CASE WHEN n_tokens >= 40 AND n_stop * 100 >= n_tokens THEN 'high'
          |     WHEN n_tokens >= 15 THEN 'medium'
          |     ELSE 'low' END AS quality""".stripMargin)

  /** The Gopher quality-filter rule set (Rae et al. 2021, arXiv:2112.11446
    * table A1) as per-document flags — the NAMED filter battery a
    * pretraining pipeline applies before anything model-based. Word-level
    * rules at the published thresholds (the line-structure rules have no
    * analog on this single-line corpus; the stop set is the house 6-word
    * list):
    *
    *   - word count in [50, 100000];
    *   - mean word length in [3, 10] (compared as exact integers:
    *     3·n ≤ Σlen ≤ 10·n — no float threshold);
    *   - ≥ 80% of words contain at least one alphabetic character
    *     (5·n_alpha ≥ 4·n);
    *   - ≥ 2 stopwords;
    *   - symbol-to-word ratio ('#' + '...') ≤ 0.1 (10·n_sym ≤ n).
    *
    * Reported means/fractions are single IEEE divisions of exact longs
    * (the house determinism rule); `pass` is the conjunction. Map-side
    * only — no shuffle, embarrassingly parallel at any corpus size.
    */
  def gopherQuality(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").selectExpr(
      "doc_id",
      s"CAST(size($toks) AS BIGINT) AS n_words",
      s"CAST(aggregate($toks, 0L, (a, t) -> a + length(t)) AS BIGINT) AS sum_word_len",
      s"CAST(size(filter($toks, t -> t RLIKE '[a-zA-Z]')) AS BIGINT) AS n_alpha_words",
      s"CAST(size(filter($toks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS BIGINT) AS n_stop",
      "CAST(length(text) - length(replace(text, '#', '')) + " +
        "(length(text) - length(replace(text, '...', ''))) div 3 AS BIGINT) AS n_symbols")
      .selectExpr("doc_id", "n_words", "sum_word_len", "n_alpha_words", "n_stop", "n_symbols",
        "CASE WHEN n_words = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(sum_word_len AS DOUBLE) / n_words END AS mean_word_len",
        "n_words BETWEEN 50 AND 100000 AS ok_word_count",
        "(3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words) AS ok_mean_len",
        "(5 * n_alpha_words >= 4 * n_words) AS ok_alpha",
        "(n_stop >= 2) AS ok_stop",
        "(10 * n_symbols <= n_words) AS ok_symbol")
      .selectExpr("doc_id", "n_words", "sum_word_len", "n_alpha_words", "n_stop",
        "n_symbols", "mean_word_len", "ok_word_count", "ok_mean_len", "ok_alpha",
        "ok_stop", "ok_symbol",
        "(ok_word_count AND ok_mean_len AND ok_alpha AND ok_stop AND ok_symbol) AS pass")

  /** Per-doc top-gram and duplicate-gram character masses for one n —
    * shared by [[gopherRepetition]]'s five arms: the codegen'd
    * [[graft.functions.GramMass]] expression (`graft_gram_mass(t, n)` →
    * `STRUCT<top_chars, dup_chars>`) computes both in ONE per-row pass.
    * Every n-gram of a document lives in its own row's token array, so the
    * old per-arm pipeline — interpreted `transform(sequence, slice,
    * array_join)` explode, a (doc, gram)-keyed shuffle, a doc window for
    * the top gram, a second aggregation for the dup mass, and two joins
    * back — was five shuffle arms for a map-side-computable statistic
    * (guide §2.4; equivalence pinned by OptimizationR13Spec, semantics
    * documented on the expression).
    */
  private def gramCharMass(n: Int): String = s"graft_gram_mass(t, $n)"

  /** The Gopher REPETITION-filter rules (Rae et al. 2021, arXiv:2112.11446
    * table A1) as per-document char-fraction flags: the fraction of
    * characters covered by the single most common n-gram for n = 2, 3, 4
    * (thresholds 0.20 / 0.18 / 0.16) and by all DUPLICATED n-grams
    * (count ≥ 2) for n = 5 and 10 (thresholds 0.15 / 0.10 — the
    * representative ends of the published 5..10 ladder; the line-based
    * rules have no analog on this single-line corpus). Character mass is
    * cnt · length(gram incl. internal spaces) over the whitespace-
    * normalized text length; every threshold compares EXACT integers
    * (e.g. 0.18 as 50·x ≤ 9·total) and the reported fractions are single
    * IEEE divisions of exact longs. Shape: five (doc, gram)-keyed partial
    * aggregations — shuffle per arm on the doc key, no all-pairs anywhere.
    */
  def gopherRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    // tokenize ONCE behind a barrier (CollapseProject would otherwise inline
    // the tokenizer into all five gram-mass consumers), then the five arms
    // are per-row expression calls — ZERO shuffles for the whole entry where
    // the old shape paid a (doc, gram) exchange + doc window + dup
    // aggregation + two joins PER ARM. The null-text case matches the old
    // absent-row/left-join path: a null array yields null structs, and the
    // coalesce keeps the published 0 defaults.
    val out = Tables(s, dir, "documents")
      .selectExpr("doc_id", s"graft_barrier($toks) AS t")
      .selectExpr("doc_id", "CAST(size(t) AS BIGINT) AS n_words",
        "CAST(aggregate(t, 0L, (a, x) -> a + length(x)) + size(t) - 1 AS BIGINT) AS total_chars",
        s"${gramCharMass(2)} AS m2", s"${gramCharMass(3)} AS m3",
        s"${gramCharMass(4)} AS m4", s"${gramCharMass(5)} AS m5",
        s"${gramCharMass(10)} AS m10")
      .selectExpr(
      "doc_id", "n_words", "total_chars",
      "coalesce(m2.top_chars, 0L) AS top2_chars",
      "coalesce(m3.top_chars, 0L) AS top3_chars",
      "coalesce(m4.top_chars, 0L) AS top4_chars",
      "coalesce(m5.dup_chars, 0L) AS dup5_chars",
      "coalesce(m10.dup_chars, 0L) AS dup10_chars")
      .selectExpr("doc_id", "n_words", "total_chars",
        "CAST(top2_chars AS DOUBLE) / total_chars AS top2_frac",
        "CAST(top3_chars AS DOUBLE) / total_chars AS top3_frac",
        "CAST(top4_chars AS DOUBLE) / total_chars AS top4_frac",
        "CAST(dup5_chars AS DOUBLE) / total_chars AS dup5_frac",
        "CAST(dup10_chars AS DOUBLE) / total_chars AS dup10_frac",
        "(5 * top2_chars <= total_chars) AS ok_top2",
        "(50 * top3_chars <= 9 * total_chars) AS ok_top3",
        "(25 * top4_chars <= 4 * total_chars) AS ok_top4",
        "(20 * dup5_chars <= 3 * total_chars) AS ok_dup5",
        "(10 * dup10_chars <= total_chars) AS ok_dup10")
      .selectExpr("doc_id", "n_words", "total_chars", "top2_frac", "top3_frac",
        "top4_frac", "dup5_frac", "dup10_frac", "ok_top2", "ok_top3", "ok_top4",
        "ok_dup5", "ok_dup10",
        "(ok_top2 AND ok_top3 AND ok_top4 AND ok_dup5 AND ok_dup10) AS pass")
    // no persist barrier anymore: the whole entry is one map-side pass, so
    // there is nothing with two consumers to materialize (Lifecycle dropped
    // together with the five shuffle arms)
    out
  }

  /** N-gram language-ID heuristic: stopword-list hit counts per language,
    * deterministic argmax with a fixed preference order on ties.
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").selectExpr(
      "doc_id", "lang",
      s"size(filter($toks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS s_en",
      s"size(filter($toks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS s_de",
      s"size(filter($toks, t -> t IN ('le', 'la', 'et', 'les', 'des'))) AS s_fr",
      s"size(filter($toks, t -> t IN ('el', 'los', 'y', 'de', 'que'))) AS s_es")
      .selectExpr("doc_id", "lang", "s_en", "s_de", "s_fr", "s_es",
        """CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
          |     WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
          |     WHEN s_fr >= s_es THEN 'fr'
          |     ELSE 'es' END AS predicted""".stripMargin)

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").selectExpr(
      "doc_id",
      s"md5(CAST(regexp_replace(lower(trim(text)), '[$WsSql]+', ' ') AS BINARY)) AS fp")

  /** Winnowed document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting algorithm): hash every k-token gram,
    * slide a window of `w` consecutive gram hashes, keep each window's
    * MINIMUM. Guarantee: any shared token run of length >= k + w - 1
    * between two documents shares at least one fingerprint — so
    * partial-overlap detection (plagiarism, boilerplate, quote reuse) needs
    * only an equi-join on the fingerprint, never a pair scan. Fingerprint
    * density is ~2/(w+1) of the gram stream, the storage/recall dial.
    *
    * Scale shape: pure per-row array expressions (no shuffle until the
    * final per-doc fingerprint groupBy); the gram hashes sit behind a
    * graft_barrier so the min-of-window lambda reads a materialized array
    * (inlined, the hash chain would re-run per window — the CollapseProject
    * hazard). The gram hash is the engine's codegen'd `hash60`, which the
    * oracle re-derives bit-exactly from md5 hex.
    */
  val WinnowK = 3
  val WinnowW = 4
  def winnow(s: SparkSession, dir: String,
             k: Int = WinnowK, w: Int = WinnowW): DataFrame =
    winnowFrom(Tables(s, dir, "documents"), k, w)

  /** The winnowing kernel over any frame with (doc_id, text): one row per
    * (doc, fingerprint) with the number of windows that selected it.
    */
  def winnowFrom(docs: DataFrame, k: Int = WinnowK, w: Int = WinnowW): DataFrame = {
    require(k >= 1 && w >= 1)
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    // ONE codegen'd per-row pass ([[graft.functions.WinnowFps]]): gram
    // hash60s, deque sliding minimum, and the per-(doc, fp) window count all
    // happen inside the expression — every window of a document lives in its
    // own row, so the old interpreted-HOF chain (two barriered transforms
    // with slice/array_join/array_min lambdas) and its groupBy SHUFFLE were
    // pure overhead (guide §2.4; bit-equivalence pinned by
    // OptimizationR13Spec; short docs yield an empty array = the old
    // size filter).
    docs
      .selectExpr("doc_id", s"explode(graft_winnow_fps($toks, $k, $w)) AS s")
      .selectExpr("doc_id", "s.fp AS fp", "s.n_windows AS n_windows")
  }

  /** Winnowing with the SELECTED POSITION kept: one row per distinct
    * (doc, fingerprint, gram position), where `pos` is the 1-based token
    * index of the gram each window selected (first occurrence of the window
    * minimum — deterministic, and identical in any two documents whose
    * window contents coincide, which is what anchor alignment in
    * [[DedupQueries.dedupSubstringFrom]] relies on). [[winnowFrom]] discards
    * positions because pair DETECTION only needs fingerprint identity;
    * run EXTRACTION needs the anchor coordinates back.
    */
  private[graft] def winnowPositionsFrom(docs: DataFrame, k: Int = WinnowK,
      w: Int = WinnowW): DataFrame = {
    require(k >= 1 && w >= 1)
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    docs
      .selectExpr("doc_id", s"graft_barrier($toks) AS tks")
      .filter(s"size(tks) >= ${k + w - 1}")
      .selectExpr("doc_id",
        s"graft_barrier(transform(sequence(1, size(tks) - ${k - 1}), " +
          s"i -> hash60(array_join(slice(tks, i, $k), ' ')))) AS hs")
      .selectExpr("doc_id",
        s"explode(array_distinct(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"i -> named_struct('fp', array_min(slice(hs, i, $w)), " +
          s"'pos', CAST(i - 1 + array_position(slice(hs, i, $w), array_min(slice(hs, i, $w))) AS INT))))) AS sel")
      .selectExpr("doc_id", "sel.fp AS fp", "sel.pos AS pos")
  }

  /** What winnowing is FOR: partial-overlap pairs. Two documents sharing
    * any winnowed fingerprint share a token run — ranked here by the count
    * of DISTINCT shared fingerprints (>= minShared prunes incidental
    * single-gram hits). One equi-join on the fingerprint — same scale-safe
    * shape as the LSH band joins. `maxDocFreq` is the hot-fingerprint skew
    * dial: a fingerprint carried by d documents contributes C(d, 2) join
    * pairs, so ubiquitous boilerplate (license headers, navigation chrome)
    * would go quadratic exactly like an LSH hot band — fingerprints above
    * the cap are dropped BEFORE the join (a stopword list for
    * fingerprints; they mark boilerplate, not meaningful overlap). The cap
    * count runs as a window over the same fp hash partitioning the pair
    * join uses. The pinned default (50) is inert on this corpus (max df 7),
    * so the oracle gates the capped code path against the uncapped answer.
    */
  def winnowPairs(s: SparkSession, dir: String, minShared: Int = 2,
                  maxDocFreq: Int = 50): DataFrame =
    winnowPairsFrom(Tables(s, dir, "documents"), minShared, maxDocFreq)

  /** The pair kernel over any frame with (doc_id, text). */
  def winnowPairsFrom(docs: DataFrame, minShared: Int = 2,
                      maxDocFreq: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDocFreq >= 1)
    // persist: only `kept` has two consumers (both sides of the pair
    // join); the raw fingerprint build feeds exactly one consumer (the
    // df window that builds `kept`), so it flows through unpersisted.
    val kept = winnowFrom(docs).select(col("doc_id"), col("fp"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("df") <= maxDocFreq)
      .select(col("doc_id"), col("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    Lifecycle.released(out, kept)
  }

  /** Asymmetric CONTAINMENT from the winnow fingerprints — the relation
    * symmetric Jaccard misses: a short document quoted wholesale inside a
    * long one has tiny Jaccard but containment ≈ 1 on the short side (the
    * quote/mirror/boilerplate-wrapper case an LLM dedup pipeline wants to
    * catch even when the host document is mostly novel). For each
    * fingerprint-sharing pair: `containment_x = shared / |fps(x)|` per
    * side. Same scale-safe shape as [[winnowPairs]] (capped fingerprint
    * equi-join, never all-pairs) plus one per-doc size frame joined back
    * to the pair-keyed result; the divisions are the only IEEE steps. The
    * pinned cap is inert on this corpus, so shared counts are exact; on a
    * boilerplate-heavy corpus capped fingerprints drop from the numerator
    * only (containment then underestimates — the conservative direction).
    */
  def containment(s: SparkSession, dir: String, minShared: Int = 2,
                  maxDocFreq: Int = 50): DataFrame =
    containmentFrom(Tables(s, dir, "documents"), minShared, maxDocFreq)

  /** The containment kernel over any frame with (doc_id, text). */
  def containmentFrom(docs: DataFrame, minShared: Int = 2,
                      maxDocFreq: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDocFreq >= 1)
    // persist: feeds the per-doc size aggregate AND (via the cap window)
    // both sides of the pair join
    val fps = winnowFrom(docs).select(col("doc_id"), col("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val kept = fps
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("df") <= maxDocFreq)
      .select(col("doc_id"), col("fp"))
    val out = kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("n_b")), Seq("doc_b"))
      .selectExpr("doc_a", "doc_b", "n_shared", "n_a", "n_b",
        "CAST(n_shared AS DOUBLE) / n_a AS containment_a",
        "CAST(n_shared AS DOUBLE) / n_b AS containment_b")
    Lifecycle.released(out, fps)
  }

  /** Unicode-canonicalized exact dedup — why normalization must precede
    * fingerprinting on a real crawl: the SAME logical text arrives in
    * different byte forms (precomposed U+00E9 vs 'e' + combining U+0301)
    * and raw byte fingerprints silently under-merge. The corpus is ASCII,
    * so the mixed forms are constructed in-query (the rel_* pattern): each
    * logical doc appears once precomposed (even keys) and once decomposed
    * (odd keys), built from hex so both engines produce identical bytes
    * (Spark's `chr` is mod-256 and cannot emit U+0301). The output proves
    * both halves: every NFC group holds 2 rows with 2 DISTINCT raw
    * fingerprints — raw dedup finds nothing, `nfc_normalize` (the engine's
    * codegen'd expression, matching DuckDB's builtin byte-for-byte) merges
    * every pair. Map-side normalize + one fingerprint groupBy — the
    * [[DedupQueries.dedupExact]] shape with a canonicalization step.
    */
  def nfcDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    Tables(s, dir, "customer")
      .selectExpr("c_custkey",
        """concat('caf',
          |  CASE WHEN c_custkey % 2 = 0 THEN decode(unhex('C3A9'), 'UTF-8')
          |       ELSE decode(unhex('65CC81'), 'UTF-8') END,
          |  ' doc ', CAST(c_custkey div 2 AS STRING)) AS doc""".stripMargin)
      .selectExpr("c_custkey",
        "md5(CAST(doc AS BINARY)) AS raw_fp",
        "md5(CAST(nfc_normalize(doc) AS BINARY)) AS nfc_fp")
      .groupBy(col("nfc_fp"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("raw_fp")).as("n_raw_forms"),
        min(col("c_custkey")).as("keeper"))
  }

  /** PII scrubbing patterns — kept inside the RE2 ∩ java.util.regex dialect
    * intersection so Spark and DuckDB redact identically.
    */
  private val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val urlPat = """https?://[A-Za-z0-9./?=&_-]+"""

  /** PII/URL redaction: count then replace emails and URLs. The corpus has
    * no PII, so the scrubable text is constructed from `customer` inside the
    * query (the rel_* pattern) and the oracle re-derives it.
    */
  def scrub(s: SparkSession, dir: String): DataFrame = {
    val sparkEmail = emailPat.replace("\\", "\\\\")
    val sparkUrl = urlPat.replace("\\", "\\\\")
    Tables(s, dir, "customer")
      .selectExpr("c_custkey",
        """concat('contact user', c_custkey, '@corp.example or admin', c_custkey,
          |  '@corp.example', CASE WHEN c_custkey % 3 = 0
          |  THEN concat(' via https://portal.example/path?id=', c_custkey) ELSE ' offline' END)
          |  AS doc""".stripMargin)
      .selectExpr("c_custkey", "doc",
        s"CAST(size(regexp_extract_all(doc, '$sparkEmail', 0)) AS INT) AS n_emails",
        s"CAST(size(regexp_extract_all(doc, '$sparkUrl', 0)) AS INT) AS n_urls",
        s"regexp_replace(regexp_replace(doc, '$sparkEmail', '<EMAIL>'), '$sparkUrl', '<URL>') AS scrubbed")
  }

  /** Repetition signals (Gopher/C4-style quality filters): duplicate-token
    * ratio and top-token fraction. `max_tok_n` (the count of the most
    * frequent token) is computed as the longest run in the SORTED token
    * array — one native array_sort + a linear fold, O(t log t) per document
    * instead of the O(distinct x tokens) nested filter it replaced (same
    * value by construction: equal tokens are adjacent after sorting).
    * Embarrassingly parallel, no cross-document state.
    */
  /** Count of the most frequent token, as the longest run in the sorted
    * token array — shared by [[repetition]] and the curation funnel.
    */
  private[ops] val maxTokNSql: String =
    s"""CAST(aggregate(array_sort($toks),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
       |  (a, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1),
       |    'best', greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1))),
       |  a -> a.best) AS INT)""".stripMargin

  def repetition(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").selectExpr(
      "doc_id",
      s"size($toks) AS n_tokens",
      s"size(array_distinct($toks)) AS n_distinct",
      s"$maxTokNSql AS max_tok_n")
      .selectExpr("doc_id", "n_tokens", "n_distinct", "max_tok_n",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(max_tok_n AS DOUBLE) / n_tokens END AS top_tok_frac",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens END AS dup_ratio")

  /** Top-3 terms per document by tf-idf. Scored as the exact-integer ratio
    * tf/df (one IEEE division of two exact longs — bit-identical in both
    * engines, unlike a log-based idf whose libm rounding may differ), with
    * token-asc tiebreaks. The document-frequency side is vocabulary-sized —
    * orders of magnitude smaller than the corpus after the term-level
    * partial aggregation — so it broadcasts; tf stays partitioned by
    * (doc, token) with map-side combine.
    */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir, "documents")
      .selectExpr("doc_id", s"explode(split(trim(lower(text)), '[$WsSql]+')) AS token")
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("token").asc)
    tf.join(broadcast(dfreq), Seq("token"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rk"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any 4-token
    * shingle with a benchmark set (source `src0` stands in for the eval
    * suite; real pipelines use 8-13-gram shingles — the synthetic 40-word
    * vocabulary makes 4 the demonstrative size). The benchmark's distinct
    * shingle set is eval-suite-sized (small), so it broadcasts and the
    * probe is a map-side hash join over the corpus shingle stream — at
    * 100 TB the corpus side is never shuffled, only streamed. Per flagged
    * doc: distinct hit count + lexicographically-first hit.
    */
  def decontaminate(s: SparkSession, dir: String,
                    benchSource: String = "src0", n: Int = 4): DataFrame = {
    require(n >= 2)
    graft.functions.GraftFunctions.registerAll(s)
    val grams = Tables(s, dir, "documents")
      .selectExpr("doc_id", "source", s"split(trim(lower(text)), '[$WsSql]+') AS t")
      .filter(s"size(t) >= $n")
      .selectExpr("doc_id", "source", s"explode(graft_ngrams(t, $n)) AS g")
    val bench = grams.filter(col("source") === benchSource).select(col("g")).distinct()
    grams.filter(col("source") =!= benchSource)
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("g")).as("n_hits"), min(col("g")).as("first_gram"))
  }

  /** Bloom-gated decontamination — the 100 TB variant of [[decontaminate]]:
    * [[decontaminate]] broadcasts the benchmark's distinct shingle set,
    * which assumes an eval suite that fits in executor memory. A
    * contamination sweep against a LARGE benchmark corpus wants the
    * `dedup_bloom` shape instead: the bench set collapses to ONE mergeable
    * `BloomFilterAggregate` sketch (only sketch bytes cross the wire),
    * every corpus gram is probed MAP-SIDE via a scalar subquery, and only
    * probable hits — true contamination plus the bloom's false-positive
    * sliver — reach the exact confirm join. On a mostly-clean corpus the
    * join input collapses from |corpus grams| to |contaminated grams| + ε.
    *
    * The output is EXACT (the confirm join eliminates false positives), so
    * the oracle is [[decontaminate]]'s — byte-identical results. Bloom keys
    * are `hash60(g)` (the probe side takes BIGINT); a 60-bit collision can
    * only ADD a false positive, which the confirm join removes.
    */
  def decontaminateBloom(s: SparkSession, dir: String,
                         benchSource: String = "src0", n: Int = 4): DataFrame = {
    require(n >= 2)
    graft.functions.GraftFunctions.registerAll(s)
    // The probe MUST be SQL: BloomFilterMightContain type-checks only a
    // foldable or scalar-subquery bloom argument, so the sketch cannot
    // arrive as a join column — and the DataFrame API has no scalar-subquery
    // constructor. The temp view that carries the gram stream into SQL is
    // therefore unavoidable; it is per-invocation-unique and dropped as soon
    // as `sql()` has analyzed the plan (analysis inlines the view, so the
    // returned DataFrame no longer references the catalog), keeping the
    // entry side-effect-free and concurrency-safe like the rest of the
    // catalog.
    val view = s"graft_decon_grams_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables(s, dir, "documents")
      .selectExpr("doc_id", "source", s"split(trim(lower(text)), '[$WsSql]+') AS t")
      .filter(s"size(t) >= $n")
      .selectExpr("doc_id", "source", s"explode(graft_ngrams(t, $n)) AS g")
      .createTempView(view)
    try {
      s.sql(
        s"""WITH bench AS (
           |  SELECT DISTINCT g FROM $view WHERE source = '$benchSource'),
           |probed AS (
           |  SELECT doc_id, source, g,
           |    graft_might_contain(
           |      (SELECT graft_bloom_agg(hash60(g), 400000L, 3200000L) FROM bench),
           |      hash60(g)) AS maybe
           |  FROM $view WHERE source <> '$benchSource')
           |SELECT p.doc_id, p.source,
           |  count(DISTINCT p.g) AS n_hits, min(p.g) AS first_gram
           |FROM (SELECT doc_id, source, g FROM probed WHERE maybe) p
           |JOIN bench b ON p.g = b.g
           |GROUP BY p.doc_id, p.source""".stripMargin)
    } finally {
      s.catalog.dropTempView(view)
    }
  }

  /** Duplicated n-gram coverage: for every document, how many of its n-gram
    * positions carry a gram that also appears in at least one OTHER document
    * — the per-document signal behind exact-substring dedup (cf. suffix-array
    * dedup, Lee et al. 2022; fixed-n shingles are the bounded-state streaming
    * approximation). A doc with high `dup_frac` is mostly boilerplate /
    * copied passages even when no whole-document fingerprint matches.
    *
    * Scale shape: the gram stream is corpus-sized, so the document-frequency
    * side is NOT broadcast (unlike [[decontaminate]], whose probe set is
    * eval-suite-sized) — both aggregations are partial+final on the gram
    * key, and the gram->df join is a plain equi-join: linear in the corpus,
    * shuffle-partitioned by gram. The exploded gram stream feeds both the
    * df aggregation and the join probe, so it sits behind a persist barrier
    * released via [[Lifecycle]].
    */
  def ngramDup(s: SparkSession, dir: String, n: Int = 4): DataFrame =
    ngramDupFrom(Tables(s, dir, "documents"), n)

  /** The coverage kernel over any frame with (doc_id, text).
    *
    * `preAggregate` trades one extra shuffle for collapsing within-doc gram
    * repeats to (doc, gram, count) before the df aggregation and probe join.
    * Measured on this corpus (255,704 positions vs 255,695 distinct pairs —
    * no repetition to collapse) it is pure overhead: 1.65 s vs 1.35 s at
    * sf0.1. On a boilerplate-heavy web corpus where a doc repeats the same
    * passage many times, the collapsed stream shrinks both shuffles and the
    * join by that repetition factor — flip it there. Both paths produce
    * identical results (spec-pinned).
    */
  def ngramDupFrom(docs: DataFrame, n: Int = 4,
                   preAggregate: Boolean = false): DataFrame = {
    val (out, grams) = ngramDupPlan(docs, n, preAggregate)
    Lifecycle.released(out, grams)
  }

  /** Lazy twin of [[ngramDupFrom]] for plan inspection (the public entry
    * returns a checkpointed LogicalRDD): (result, persisted gram barrier —
    * the caller releases it).
    */
  private[graft] def ngramDupPlan(docs: DataFrame, n: Int = 4,
                                  preAggregate: Boolean = false): (DataFrame, DataFrame) = {
    require(n >= 2)
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    val positions = docs
      .selectExpr("doc_id", s"split(trim(lower(text)), '[$WsSql]+') AS t")
      .filter(s"size(t) >= $n")
      .selectExpr("doc_id", s"explode(graft_ngrams(t, $n)) AS g")
    val grams =
      (if (preAggregate)
        positions.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      else positions.withColumn("cnt", lit(1L)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df over distinct (doc, gram) pairs: countDistinct on the raw stream,
    // plain count when the pre-agg already collapsed to distinct pairs
    val dfreq =
      if (preAggregate) grams.groupBy(col("g")).agg(count(lit(1)).as("nd"))
      else grams.groupBy(col("g")).agg(countDistinct(col("doc_id")).as("nd"))
    val out = grams.join(dfreq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"),
        sum(when(col("nd") >= 2, col("cnt")).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac", col("n_dup_grams").cast("double") / col("n_grams"))
    (out, grams)
  }

  /** Hashed-feature linear quality model (the fasttext-style classifier a
    * production pipeline runs as its learned quality filter): each token
    * hashes into one of [[ModelDim]] buckets (first 8 bits of md5, exactly
    * uniform mod 64) and contributes that bucket's weight; the document
    * score is the mean weight per token. The weight table here is a
    * deterministic stand-in (Knuth multiplicative hash of the bucket index)
    * — a real deployment swaps in trained weights, same plan. The table is
    * a literal array, i.e. broadcast-by-construction; scoring is a pure
    * projection — no shuffle, no UDF, embarrassingly parallel at 100 TB.
    * Scoring is exact-integer until one final IEEE division, so Spark and
    * DuckDB agree bit-for-bit.
    */
  val ModelDim = 64
  private[ops] val modelWeights: IndexedSeq[Long] =
    (0 until ModelDim).map(i => (i.toLong * 2654435761L) % 2001L - 1000L)

  private def hexVal(src: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($src, $i, 1)) - 1)"
  /** Feature bucket of token expression `t`: first 8 md5 bits mod [[ModelDim]]. */
  private[ops] def bucketOf(t: String): String =
    s"((${hexVal(s"md5($t)", 1)} * 16 + ${hexVal(s"md5($t)", 2)}) % $ModelDim)"

  /** Exact-integer model score — shared by [[qualityModelFrom]] and the
    * curation funnel.
    */
  private[ops] def scoreRawSqlOf(tok: Tokenizer): String = {
    val wArr = modelWeights.mkString("array(", "L, ", "L)")
    s"CAST(aggregate(${tok.sql("text")}, 0L, (acc, t) -> acc + element_at($wArr, CAST(${bucketOf("t")} AS INT) + 1)) AS BIGINT)"
  }
  private[ops] val scoreRawSql: String = scoreRawSqlOf(Tokenize.Whitespace)

  def qualityModel(s: SparkSession, dir: String): DataFrame =
    qualityModelFrom(Tables(s, dir, "documents"))

  /** The scoring kernel over any frame with (doc_id, text); `tok` is the
    * tokenizer dial ([[Tokenize.Whitespace]] is the pinned default).
    */
  def qualityModelFrom(docs: DataFrame,
                       tok: Tokenizer = Tokenize.Whitespace): DataFrame = {
    docs
      .selectExpr(
        "doc_id",
        s"size(${tok.sql("text")}) AS n_tokens",
        s"${scoreRawSqlOf(tok)} AS score_raw")
      .selectExpr("doc_id", "n_tokens", "score_raw",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(score_raw AS DOUBLE) / n_tokens END AS score",
        "CASE WHEN score_raw >= 0 THEN 'keep' ELSE 'drop' END AS label")
  }

  /** Corpus bigram-frequency LM score — the shape of a perplexity filter
    * (CCNet-style) with the KenLM stand-in being the corpus's own bigram
    * table: each document is scored by how frequent its bigrams are across
    * the whole corpus (rare-bigram docs ≈ high perplexity ≈ drop
    * candidates). The "model" is a partial-aggregated groupBy on the
    * bigram — map-side combine collapses repeated bigrams BEFORE any data
    * moves, so the shuffled count table is vocabulary-sized, not
    * corpus-sized, and AQE broadcasts it back over the grams (the corpus
    * itself never shuffles; plan- and bench-verified 6x faster than the
    * window-count alternative, [[lmScoreWindowed]], which must shuffle and
    * sort every bigram OCCURRENCE). The score stays exact-integer until
    * one final IEEE division of the same two integers in both engines —
    * bit-identical, the house determinism rule.
    *
    * The tokenized docs sit behind a persist barrier for the same reason as
    * [[DedupQueries]]' shingles: CollapseProject inlines the `split` alias
    * into BOTH `element_at` calls of the bigram lambda, re-running the regex
    * split per element — O(tokens^2) work per document — and the gram stream
    * feeds two consumers (the count build and the probe). Reading tokens
    * from a materialized attribute makes gram construction O(tokens)
    * (measured at sf0.1: 9.1 s -> 0.5 s median).
    */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val (out, tks) = lmScorePlan(s, dir)
    Lifecycle.released(out, tks)
  }

  /** Lazy twin of [[lmScore]] for plan inspection (the public entry returns
    * a checkpointed LogicalRDD): (result, persisted tokens barrier — the
    * caller releases it).
    */
  private[graft] def lmScorePlan(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tks = lmToks(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // barrier: tokenize once, not per element
    val grams = lmGramsFrom(tks)
    val counts = grams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val out = grams.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("freq_sum"))
      .selectExpr("doc_id", "n_bigrams", "freq_sum",
        "CAST(freq_sum AS DOUBLE) / n_bigrams AS lm_score")
    (out, tks)
  }

  private def lmToks(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .selectExpr("doc_id", s"$toks AS tks")
      .filter("size(tks) >= 2") // sequence(1, n) DESCENDS for n < 1

  private def lmGramsFrom(tks: DataFrame): DataFrame =
    tks.selectExpr("doc_id",
      "explode(transform(sequence(1, size(tks) - 1), " +
        "i -> concat(element_at(tks, i), ' ', element_at(tks, i + 1)))) AS bg")

  /** The window-count formulation — shuffles and sorts every bigram
    * occurrence; kept as the spec's equivalence anchor for [[lmScore]].
    */
  private[ops] def lmScoreWindowed(s: SparkSession, dir: String): DataFrame =
    lmGramsFrom(lmToks(s, dir))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("bg"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("freq_sum"))
      .selectExpr("doc_id", "n_bigrams", "freq_sum",
        "CAST(freq_sum AS DOUBLE) / n_bigrams AS lm_score")

  /** Corpus vocabulary profile: top-50 tokens by total frequency with
    * document frequency and corpus share — the Zipf-curve / stopword
    * dashboard a curation pipeline reads before choosing filters. One
    * partial-aggregated groupBy on the token (term frequency AND document
    * frequency from the same shuffle via a per-doc distinct explode), the
    * corpus total from a broadcast 1-row aggregate, and a tie-broken
    * TakeOrdered top-50 — never a full sort of the vocabulary.
    */
  def vocab(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val perDoc = docs.selectExpr("doc_id", s"explode($toks) AS tok")
    val counts = perDoc.groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val total = counts.agg(sum(col("tf")).as("corpus_toks"))
    counts.crossJoin(broadcast(total))
      .select(col("tok"), col("tf"), col("df"),
        (col("tf").cast("double") / col("corpus_toks")).as("share"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(50)
  }

  /** GPT-2-style regex pre-tokenizer BASE pattern, restricted to the
    * RE2 ∩ java.util.regex intersection so the DuckDB oracle can replay it
    * exactly: contraction suffixes, optionally-space-prefixed letter runs,
    * digit runs, punctuation runs, then maximal whitespace runs.
    * Alternation is leftmost-first in BOTH engines (Java regex; DuckDB's
    * RE2 in its default non-POSIX mode), so the base piece streams agree.
    * Whitespace is the EXPLICIT class [[Tokenize.WsClass]] rather than
    * `\s`: Java's `\s` includes vertical tab (\x0B) while RE2's excludes
    * it — the one byte where the engines' shorthands disagree, and a
    * latent hash-gate flake if it ever appears in a corpus. As of round 10
    * every dual-engine regex in the repo spells whitespace this way.
    *
    * This base pattern alone diverges from true GPT-2 on one construct:
    * GPT-2's `\s+(?!\S)` lookahead hands the LAST whitespace char of an
    * interior run to the following piece, and lookahead is
    * RE2-inexpressible. [[gpt2PiecesSqlOf]] / [[duckGpt2PiecesOf]] close
    * that gap with a position-arithmetic post-pass over the base pieces —
    * use THOSE for the true piece stream; the raw pattern is only the
    * shared first pass.
    */
  private val WsClass = Tokenize.WsClass
  private val WsSql = Tokenize.WsClassSql
  val Gpt2PretokenPattern: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^$WsClass\\p{L}\\p{N}]+|[$WsClass]+"

  /** The lookahead-closing post-pass over a bound base-piece array `b`,
    * identical arithmetic on both engines. Derivation of true GPT-2
    * behavior (leftmost-first alternation, reference pattern
    * `.. | \s+(?!\S) | \s+`):
    *   - a maximal whitespace run of length n >= 2 followed by \S matches
    *     `\s+(?!\S)` for exactly n-1 chars (backtracking stops where the
    *     next char is still whitespace); the leftover char then either
    *     fuses into the next piece (it is ' ' — the ` ?X+` alternatives
    *     absorb it) or stands alone (any other whitespace — ` ?` matches
    *     only a literal space);
    *   - a fused ' ' before a contraction re-splits it: at " 's" the
    *     contraction alternative cannot match (leading space), so
    *     ` ?[^ws L N]+` takes " '" and the letters follow as their own
    *     piece — [" '", "s"], NOT [" 's"];
    *   - terminal runs (nothing follows) match `\s+(?!\S)` whole, and
    *     single-char interior runs only ever arise for non-space
    *     whitespace (a lone ' ' is absorbed by the next alternative), so
    *     both pass through unchanged.
    * Pinned against a true-lookahead reference on multi-space/tab/newline
    * fixtures in Round10Spec. Conserves characters, so the lossless gate
    * still proves full coverage.
    */
  private def gpt2PostPassSql(b: String): String = {
    // Spark SQL string literals: quotes escape as \' (doubling '' would
    // parse as two ADJACENT literals and silently concatenate)
    val wsRun = s"'^[$WsSql]+$$'"
    val contr = "'^\\'(?:s|t|re|ve|m|ll|d)$'"
    val letter = "'^\\\\p{L}'"
    val p = s"element_at($b, i)"
    val q = s"element_at($b, i - 1)"
    def donor(x: String) =
      s"$x rlike $wsRun AND length($x) >= 2 AND right($x, 1) = ' '"
    // A donated space re-splits a contraction (" 's" -> " '" + "s") and
    // the FREED LETTERS then fuse with an immediately-following space-less
    // letter run ("ws 'lldon't": true pieces are " '", "lldon", "'t" —
    // ` ?\p{L}+` runs through the old piece boundary). The third branch
    // drops the absorbed run; digits/punct/contractions after the
    // re-split do NOT fuse (`\p{L}+` stops at them), property-pinned
    // against the with-lookahead reference on randomized fixtures.
    s"""CASE WHEN size($b) = 0 THEN $b ELSE flatten(transform(sequence(1, size($b)), i ->
       |  CASE WHEN $p rlike $wsRun AND i < size($b) AND length($p) >= 2 THEN
       |         CASE WHEN right($p, 1) = ' ' THEN array(left($p, length($p) - 1))
       |              ELSE array(left($p, length($p) - 1), right($p, 1)) END
       |       WHEN i > 1 AND ${donor(q)} THEN
       |         CASE WHEN $p rlike $contr THEN array(' \\'', concat(substring($p, 2),
       |                CASE WHEN i < size($b) AND element_at($b, i + 1) rlike $letter
       |                     THEN element_at($b, i + 1) ELSE '' END))
       |              ELSE array(concat(' ', $p)) END
       |       WHEN i > 2 AND ${donor(s"element_at($b, i - 2)")}
       |            AND element_at($b, i - 1) rlike $contr AND $p rlike $letter THEN
       |         CAST(array() AS ARRAY<STRING>)
       |       ELSE array($p) END)) END""".stripMargin
  }

  /** Spark SQL expression: the TRUE GPT-2 piece stream of `textRef`.
    * The base extraction is bound ONCE through a 1-element-array lambda
    * (`transform(array(base), b -> postpass)`), so no alias inlining can
    * ever re-run the regex per reference.
    */
  def gpt2PiecesSqlOf(textRef: String): String = {
    val pat = Gpt2PretokenPattern.replace("\\", "\\\\").replace("'", "\\'")
    val base = s"regexp_extract_all($textRef, '$pat', 0)"
    s"element_at(transform(array($base), b -> ${gpt2PostPassSql("b")}), 1)"
  }

  /** DuckDB twin of [[gpt2PiecesSqlOf]] (1-based list slicing; RE2). */
  private[ops] def duckGpt2PiecesOf(textRef: String): String = {
    val pat = Gpt2PretokenPattern.replace("'", "''")
    val wsRun = s"'^[$WsClass]+$$'"
    val contr = "'^''(?:s|t|re|ve|m|ll|d)$'"
    val letter = "'^\\p{L}'"
    val b = s"regexp_extract_all($textRef, '$pat')"
    def donor(x: String) =
      s"regexp_matches($x, $wsRun) AND length($x) >= 2 AND $x[-1] = ' '"
    s"""CASE WHEN len($b) = 0 THEN [] ELSE flatten(list_transform(range(1, len($b) + 1), i ->
       |  CASE WHEN regexp_matches($b[i], $wsRun) AND i < len($b) AND length($b[i]) >= 2 THEN
       |         CASE WHEN $b[i][-1] = ' ' THEN [$b[i][1:-2]] ELSE [$b[i][1:-2], $b[i][-1]] END
       |       WHEN i > 1 AND ${donor(s"$b[i-1]")} THEN
       |         CASE WHEN regexp_matches($b[i], $contr) THEN [' ''', $b[i][2:] ||
       |                CASE WHEN i < len($b) AND regexp_matches($b[i+1], $letter)
       |                     THEN $b[i+1] ELSE '' END]
       |              ELSE [' ' || $b[i]] END
       |       WHEN i > 2 AND ${donor(s"$b[i-2]")}
       |            AND regexp_matches($b[i-1], $contr) AND regexp_matches($b[i], $letter) THEN
       |         []
       |       ELSE [$b[i]] END)) END""".stripMargin
  }

  /** Catalog entry: pre-tokenization profile per document — the stage that
    * feeds byte-level BPE in a real GPT-2-shaped tokenizer (pre-tokenize →
    * byte-level merges within pieces): piece counts by class plus a
    * LOSSLESSNESS flag (the concatenated pieces must reproduce the text
    * byte-for-byte — `sum(length(piece)) = length(text)`, which the oracle
    * pins at 1 for every document; a pattern that dropped or overlapped a
    * character would fail the gate, not just look odd). Pure map-side
    * expressions.
    */
  def pretokenize(s: SparkSession, dir: String): DataFrame =
    pretokenizeFrom(Tables(s, dir, "documents"))

  /** The pre-tokenizer kernel over any (doc_id, text) frame — TRUE GPT-2
    * piece boundaries ([[gpt2PiecesSqlOf]]: base pattern + lookahead
    * post-pass). The piece array is barriered: the counting projection
    * references it seven times, and CollapseProject would otherwise inline
    * seven regex extractions per row.
    */
  def pretokenizeFrom(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(docs.sparkSession)
    docs.selectExpr("doc_id",
        s"graft_barrier(${gpt2PiecesSqlOf("text")}) AS pieces",
        "length(text) AS n_chars")
      .select(col("doc_id"),
        size(col("pieces")).as("n_pieces"),
        // the FULL contraction shape, anchored: a bare/closing quote piece
        // (' ?[^..]+' matched it) is punctuation, not a contraction
        size(filter(col("pieces"), p => p.rlike("^'(?:s|t|re|ve|m|ll|d)$"))).as("n_contraction"),
        size(filter(col("pieces"), p => p.rlike("^ ?\\p{L}"))).as("n_alpha"),
        size(filter(col("pieces"), p => p.rlike("^ ?\\p{N}"))).as("n_num"),
        size(filter(col("pieces"), p => p.rlike(s"^[$WsClass]+$$"))).as("n_space"),
        aggregate(col("pieces"), lit(0), (a, p) => a + length(p)).as("covered"),
        col("n_chars"))
      .select(col("doc_id"), col("n_pieces"), col("n_contraction"),
        col("n_alpha"), col("n_num"), col("n_space"),
        (col("n_pieces") - col("n_contraction") - col("n_alpha") -
          col("n_num") - col("n_space")).as("n_other"),
        when(col("covered") === col("n_chars"), 1).otherwise(0).as("lossless"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pretokenize" -> pretokenize,
    "text_vocab" -> vocab,
    "text_lm_score" -> lmScore,
    "text_tfidf" -> tfidf,
    "text_decontaminate" -> ((s, dir) => decontaminate(s, dir)),
    "text_decontaminate_bloom" -> ((s, dir) => decontaminateBloom(s, dir)),
    "text_tokens" -> tokenStats,
    "text_quality" -> qualityScore,
    "text_langid" -> langId,
    "text_fingerprint" -> fingerprint,
    "text_winnow" -> ((s, dir) => winnow(s, dir)),
    "text_nfc_dedup" -> nfcDedup,
    "text_winnow_pairs" -> ((s, dir) => winnowPairs(s, dir)),
    "text_containment" -> ((s, dir) => containment(s, dir)),
    "text_scrub" -> scrub,
    "text_repetition" -> repetition,
    "text_ngram_dup" -> ((s, dir) => ngramDup(s, dir)),
    "text_quality_model" -> qualityModel,
    "text_gopher_quality" -> gopherQuality,
    "text_gopher_repetition" -> gopherRepetition,
  )

  private val duckToks = s"regexp_split_to_array(trim(text), '[$WsClass]+')"
  private val duckWArr = modelWeights.mkString("[", ", ", "]")
  /** DuckDB twins of [[scoreRawSql]] / [[maxTokNSql]] for composed oracles. */
  private[ops] val duckScoreRawSql: String =
    s"CAST(list_sum(list_transform($duckToks, t -> ($duckWArr)[${bucketOf("t")} + 1])) AS BIGINT)"
  private[ops] val duckMaxTokNSql: String =
    s"CAST(list_max(list_transform(list_distinct($duckToks), t -> len(list_filter($duckToks, x -> x = t)))) AS INT)"
  private[ops] val duckNTokensSql: String = s"CAST(len($duckToks) AS INT)"

  // --- the RICH-VOCABULARY text arm -------------------------------------

  /** Vocabulary dial of the rich arm: hex pseudo-words drawn from a
    * [[RichVocab]]-word dictionary — thousands of distinct words where the
    * synthetic documents corpus has ~31, so BPE runs hundreds of LIVE
    * merges (the 31-word corpus exhausts at 89) and Jaccard true-pair sets
    * stay LINEAR (the 31-word corpus's are quadratic — ROADMAP's
    * "output-bound" caveat, retired on this arm).
    */
  val RichVocab = 2048

  /** Deterministic high-vocabulary corpus derived on-engine, identically
    * re-derivable in DuckDB ([[duckRichCorpusCte]]): per customer key g,
    * TWO 16-word docs (ids 2g, 2g+1) of hex pseudo-words
    * `substr(md5('v' || widx), 1, 10)` with `widx = hash60(seed) % RichVocab`
    * (hash60 = the portable 15-hex-md5-prefix bigint, nonnegative so `%`
    * == pmod on both engines). Every fifth pair is a PLANTED near-dup —
    * side 1 reuses side 0's seeds at positions 1..14 (Jaccard ≈ 14/18);
    * all other cross-doc similarity is the ~16/2048 random-draw floor.
    * `lang = g % 4` gives the block dial its four groups. Map-side only:
    * one projection over the customer scan, no shuffle, corpus-size
    * scaling with the fact table.
    */
  private[graft] def richCorpus(s: SparkSession, dir: String,
                                vocab: Int = RichVocab): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    Tables(s, dir, "customer").selectExpr("c_custkey AS g")
      .selectExpr("g", "explode(array(0, 1)) AS side")
      .selectExpr("2 * g + side AS doc_id", "CAST(g % 4 AS STRING) AS lang",
        "array_join(transform(sequence(1, 16), i -> " +
          "substr(md5(concat('v', CAST(hash60(" +
          "CASE WHEN side = 0 OR (g % 5 = 0 AND i <= 14) " +
          "THEN concat('r', g, '_', i) ELSE concat('q', g, '_', i) END" +
          s") % $vocab AS STRING))), 1, 10)), ' ') AS text")
  }

  /** DuckDB twin of [[richCorpus]] — a `rich(doc_id, lang, text)` CTE. */
  private[ops] def duckRichCorpusCte: String = {
    val seed = "CASE WHEN side = 0 OR (g % 5 = 0 AND i <= 14) " +
      "THEN 'r' || g || '_' || i ELSE 'q' || g || '_' || i END"
    val h60 = s"CAST(('0x' || substr(md5($seed), 1, 15)) AS BIGINT)"
    s"""rich AS (
       |  SELECT 2 * g + side AS doc_id, CAST(g % 4 AS VARCHAR) AS lang,
       |    array_to_string(list_transform(range(1, 17), i ->
       |      substr(md5('v' || CAST($h60 % $RichVocab AS VARCHAR)), 1, 10)), ' ') AS text
       |  FROM (SELECT c_custkey AS g, unnest([0, 1]) AS side FROM customer) b)""".stripMargin
  }

  /** Shared winnowing CTE chain (k=3 grams, w=4 windows; `wins(doc_id, fp)`
    * one row per window). Range bounds mirror the Spark sequences exactly:
    * gram positions 1..n-2 (DuckDB range is end-exclusive), window positions
    * 1..m-3; the gram hash re-derives `hash60` from md5 hex bit-exactly.
    */
  private val winnowCtes: String = winnowCtesFrom("documents")

  /** The chain over an arbitrary (doc_id, text) relation — ONE copy of the
    * k=3/w=4 gram-hash derivation shared with the streaming winnow gate's
    * oracle (the [[graft.ops.DedupQueries.minhashBandsCtesFrom]] pattern).
    */
  private[graft] def winnowCtesFrom(rel: String): String =
    s"""tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '[${Tokenize.WsClass}]+') AS t FROM $rel),
      |hs AS (
      |  SELECT doc_id, list_transform(range(1, len(t) - 1),
      |    i -> CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15)) AS BIGINT)) AS hs
      |  FROM tok WHERE len(t) >= 6),
      |wins AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(hs) - 2),
      |    i -> list_min(hs[i:i+3]))) AS fp
      |  FROM hs)""".stripMargin

  private val decontaminateOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '[\t\n\x0B\f\r ]+') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(t) - 2),
      |    i -> array_to_string(t[i:i+3], ' '))) AS g
      |  FROM tok WHERE len(t) >= 4),
      |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
      |SELECT gr.doc_id, gr.source,
      |  CAST(count(DISTINCT gr.g) AS BIGINT) AS n_hits, min(gr.g) AS first_gram
      |FROM grams gr JOIN bench b ON gr.g = b.g
      |WHERE gr.source <> 'src0'
      |GROUP BY 1, 2""".stripMargin

  /** One n-gram arm of the gopher_repetition oracle: grams + per-(doc, gram)
    * counts, mirrored term-for-term with [[gramCharMass]].
    */
  private def duckGramArm(n: Int): String =
    s"""g$n AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - ${n - 2}),
       |  i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
       |  FROM tok WHERE len(t) >= $n),
       |c$n AS (SELECT doc_id, g, count(1) AS cnt FROM g$n GROUP BY 1, 2)""".stripMargin

  private def duckTopArm(n: Int): String =
    s"""t$n AS (SELECT doc_id, CAST(cnt * length(g) AS BIGINT) AS top${n}_chars FROM (
       |  SELECT doc_id, g, cnt,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rk
       |  FROM c$n) z WHERE rk = 1)""".stripMargin

  private def duckDupArm(n: Int): String =
    s"""d$n AS (SELECT doc_id,
       |  CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS dup${n}_chars
       |  FROM c$n GROUP BY 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "text_gopher_quality" ->
      s"""SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stop, n_symbols,
         |  CASE WHEN n_words = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(sum_word_len AS DOUBLE) / n_words END AS mean_word_len,
         |  n_words BETWEEN 50 AND 100000 AS ok_word_count,
         |  (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words) AS ok_mean_len,
         |  (5 * n_alpha_words >= 4 * n_words) AS ok_alpha,
         |  (n_stop >= 2) AS ok_stop,
         |  (10 * n_symbols <= n_words) AS ok_symbol,
         |  (n_words BETWEEN 50 AND 100000
         |    AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
         |    AND 5 * n_alpha_words >= 4 * n_words AND n_stop >= 2
         |    AND 10 * n_symbols <= n_words) AS pass
         |FROM (
         |  SELECT doc_id,
         |    CAST(len($duckToks) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform($duckToks, t -> length(t))), 0) AS BIGINT) AS sum_word_len,
         |    CAST(len(list_filter($duckToks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
         |    CAST(len(list_filter($duckToks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS BIGINT) AS n_stop,
         |    CAST(length(text) - length(replace(text, '#', ''))
         |      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols
         |  FROM documents) t""".stripMargin,
    "text_gopher_repetition" ->
      s"""WITH tok AS MATERIALIZED (SELECT doc_id, $duckToks AS t FROM documents),
         |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) + len(t) - 1 AS BIGINT) AS total_chars
         |  FROM tok),
         |${duckGramArm(2)}, ${duckTopArm(2)},
         |${duckGramArm(3)}, ${duckTopArm(3)},
         |${duckGramArm(4)}, ${duckTopArm(4)},
         |${duckGramArm(5)}, ${duckDupArm(5)},
         |${duckGramArm(10)}, ${duckDupArm(10)},
         |j AS (
         |  SELECT b.doc_id, b.n_words, b.total_chars,
         |    coalesce(t2.top2_chars, 0) AS top2_chars,
         |    coalesce(t3.top3_chars, 0) AS top3_chars,
         |    coalesce(t4.top4_chars, 0) AS top4_chars,
         |    coalesce(d5.dup5_chars, 0) AS dup5_chars,
         |    coalesce(d10.dup10_chars, 0) AS dup10_chars
         |  FROM base b
         |  LEFT JOIN t2 ON t2.doc_id = b.doc_id
         |  LEFT JOIN t3 ON t3.doc_id = b.doc_id
         |  LEFT JOIN t4 ON t4.doc_id = b.doc_id
         |  LEFT JOIN d5 ON d5.doc_id = b.doc_id
         |  LEFT JOIN d10 ON d10.doc_id = b.doc_id)
         |SELECT doc_id, n_words, total_chars,
         |  CAST(top2_chars AS DOUBLE) / total_chars AS top2_frac,
         |  CAST(top3_chars AS DOUBLE) / total_chars AS top3_frac,
         |  CAST(top4_chars AS DOUBLE) / total_chars AS top4_frac,
         |  CAST(dup5_chars AS DOUBLE) / total_chars AS dup5_frac,
         |  CAST(dup10_chars AS DOUBLE) / total_chars AS dup10_frac,
         |  (5 * top2_chars <= total_chars) AS ok_top2,
         |  (50 * top3_chars <= 9 * total_chars) AS ok_top3,
         |  (25 * top4_chars <= 4 * total_chars) AS ok_top4,
         |  (20 * dup5_chars <= 3 * total_chars) AS ok_dup5,
         |  (10 * dup10_chars <= total_chars) AS ok_dup10,
         |  (5 * top2_chars <= total_chars AND 50 * top3_chars <= 9 * total_chars
         |    AND 25 * top4_chars <= 4 * total_chars AND 20 * dup5_chars <= 3 * total_chars
         |    AND 10 * dup10_chars <= total_chars) AS pass
         |FROM j""".stripMargin,
    // base pattern + the SAME lookahead post-pass on both engines; the
    // lossless flag pinned at 1 proves the piece stream covers every char
    "text_pretokenize" -> {
      val contr = "'^''(?:s|t|re|ve|m|ll|d)$$'"
      val space = s"'^[$WsClass]+$$'"
      s"""WITH p AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    ${duckGpt2PiecesOf("text")} AS pieces
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(pieces) AS INT) AS n_pieces,
         |  CAST(len(list_filter(pieces, x -> regexp_matches(x, $contr))) AS INT) AS n_contraction,
         |  CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?\\p{L}'))) AS INT) AS n_alpha,
         |  CAST(len(list_filter(pieces, x -> regexp_matches(x, '^ ?\\p{N}'))) AS INT) AS n_num,
         |  CAST(len(list_filter(pieces, x -> regexp_matches(x, $space))) AS INT) AS n_space,
         |  CAST(len(pieces)
         |    - len(list_filter(pieces, x -> regexp_matches(x, $contr)))
         |    - len(list_filter(pieces, x -> regexp_matches(x, '^ ?\\p{L}')))
         |    - len(list_filter(pieces, x -> regexp_matches(x, '^ ?\\p{N}')))
         |    - len(list_filter(pieces, x -> regexp_matches(x, $space))) AS INT) AS n_other,
         |  CAST(CASE WHEN coalesce(list_sum(list_transform(pieces, x -> length(x))), 0) = n_chars
         |       THEN 1 ELSE 0 END AS INT) AS lossless
         |FROM p""".stripMargin
    },
    "text_vocab" ->
      s"""WITH tk AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
         |c AS (
         |  SELECT tok, CAST(count(1) AS BIGINT) AS tf,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tk GROUP BY 1),
         |t AS (SELECT CAST(sum(tf) AS BIGINT) AS corpus_toks FROM c)
         |SELECT tok, tf, df, CAST(tf AS DOUBLE) / corpus_toks AS share
         |FROM c, t
         |ORDER BY tf DESC, tok ASC LIMIT 50""".stripMargin,
    "text_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '[\t\n\x0B\f\r ]+') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM tok WHERE len(t) >= 2),
        |c AS (SELECT doc_id, count(1) OVER (PARTITION BY bg) AS cnt FROM grams)
        |SELECT doc_id, CAST(count(1) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cnt) AS BIGINT) AS freq_sum,
        |  CAST(sum(cnt) AS DOUBLE) / count(1) AS lm_score
        |FROM c GROUP BY 1""".stripMargin,
    "text_ngram_dup" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[\t\n\x0B\f\r ]+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
        |    i -> array_to_string(t[i:i+3], ' '))) AS g
        |  FROM tok WHERE len(t) >= 4),
        |dfreq AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY 1)
        |SELECT gr.doc_id,
        |  CAST(count(1) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |  CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(1) AS dup_frac
        |FROM grams gr JOIN dfreq d USING (g)
        |GROUP BY 1""".stripMargin,
    "text_quality_model" ->
      s"""SELECT doc_id, n_tokens, score_raw,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(score_raw AS DOUBLE) / n_tokens END AS score,
         |  CASE WHEN score_raw >= 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM (
         |  SELECT doc_id,
         |    $duckNTokensSql AS n_tokens,
         |    $duckScoreRawSql AS score_raw
         |  FROM documents) x""".stripMargin,
    "text_decontaminate" -> decontaminateOracle,
    // the bloom-gated variant is EXACT (confirm join removes false
    // positives), so its oracle is the plain membership test — byte-for-byte
    // the same SQL as the broadcast variant's
    "text_decontaminate_bloom" -> decontaminateOracle,
    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[\t\n\x0B\f\r ]+')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, count(1) AS tf FROM tok GROUP BY 1, 2),
        |dfc AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1)
        |SELECT doc_id, token, tf, df, rk FROM (
        |  SELECT t.doc_id, t.token, t.tf, d.df,
        |    CAST(row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.token ASC) AS INT) AS rk
        |  FROM tfc t JOIN dfc d USING (token)) x
        |WHERE rk <= 3""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($duckToks) AS INT) AS n_tokens,
         |  CAST(len(list_distinct($duckToks)) AS INT) AS n_distinct_tokens,
         |  CAST(length(text) AS INT) AS n_chars_computed,
         |  CAST(list_sum(list_transform($duckToks, t -> length(t))) AS BIGINT) AS total_token_chars,
         |  CAST(list_sum(list_transform($duckToks, t -> (length(t) + 3) // 4)) AS BIGINT) AS est_bpe_tokens
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, n_chars, n_tokens, n_stop, n_digits, n_punct,
         |  CASE WHEN n_tokens >= 40 AND n_stop * 100 >= n_tokens THEN 'high'
         |       WHEN n_tokens >= 15 THEN 'medium'
         |       ELSE 'low' END AS quality
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS INT) AS n_chars,
         |    CAST(len($duckToks) AS INT) AS n_tokens,
         |    CAST(len(list_filter($duckToks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS INT) AS n_stop,
         |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits,
         |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct
         |  FROM documents) t""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS predicted
         |FROM (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter($duckToks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS INT) AS s_en,
         |    CAST(len(list_filter($duckToks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS INT) AS s_de,
         |    CAST(len(list_filter($duckToks, t -> t IN ('le', 'la', 'et', 'les', 'des'))) AS INT) AS s_fr,
         |    CAST(len(list_filter($duckToks, t -> t IN ('el', 'los', 'y', 'de', 'que'))) AS INT) AS s_es
         |  FROM documents) t""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '[\t\n\x0B\f\r ]+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "text_nfc_dedup" ->
      """WITH d AS (
        |  SELECT c_custkey,
        |    'caf' || CASE WHEN c_custkey % 2 = 0 THEN decode(from_hex('C3A9'))
        |                  ELSE decode(from_hex('65CC81')) END
        |      || ' doc ' || CAST(c_custkey // 2 AS VARCHAR) AS doc
        |  FROM customer),
        |fp AS (
        |  SELECT c_custkey, md5(doc) AS raw_fp, md5(nfc_normalize(doc)) AS nfc_fp FROM d)
        |SELECT nfc_fp, CAST(count(1) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT raw_fp) AS BIGINT) AS n_raw_forms,
        |  min(c_custkey) AS keeper
        |FROM fp GROUP BY 1""".stripMargin,
    "text_winnow" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, fp, CAST(count(1) AS BIGINT) AS n_windows
         |FROM wins GROUP BY 1, 2""".stripMargin,
    "text_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |fps AS (SELECT DISTINCT doc_id, fp FROM wins),
         |kept AS (SELECT doc_id, fp FROM (
         |  SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS df FROM fps) t
         |  WHERE df <= 50)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(1) AS BIGINT) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(1) >= 2""".stripMargin,
    "text_containment" ->
      s"""WITH $winnowCtes,
         |fps AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wins),
         |sizes AS (SELECT doc_id, count(1) AS n_fp FROM fps GROUP BY 1),
         |kept AS (SELECT doc_id, fp FROM (
         |  SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS df FROM fps) t
         |  WHERE df <= 50),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(1) AS BIGINT) AS n_shared
         |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(1) >= 2)
         |SELECT doc_a, doc_b, n_shared,
         |  CAST(sa.n_fp AS BIGINT) AS n_a, CAST(sb.n_fp AS BIGINT) AS n_b,
         |  CAST(n_shared AS DOUBLE) / sa.n_fp AS containment_a,
         |  CAST(n_shared AS DOUBLE) / sb.n_fp AS containment_b
         |FROM pairs JOIN sizes sa ON sa.doc_id = pairs.doc_a
         |JOIN sizes sb ON sb.doc_id = pairs.doc_b""".stripMargin,
    "text_scrub" ->
      s"""WITH d AS (
         |  SELECT c_custkey,
         |    'contact user' || c_custkey || '@corp.example or admin' || c_custkey ||
         |    '@corp.example' || CASE WHEN c_custkey % 3 = 0
         |      THEN ' via https://portal.example/path?id=' || c_custkey ELSE ' offline' END AS doc
         |  FROM customer)
         |SELECT c_custkey, doc,
         |  CAST(len(regexp_extract_all(doc, '$emailPat')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(doc, '$urlPat')) AS INT) AS n_urls,
         |  regexp_replace(regexp_replace(doc, '$emailPat', '<EMAIL>', 'g'), '$urlPat', '<URL>', 'g') AS scrubbed
         |FROM d""".stripMargin,
    "text_repetition" ->
      s"""SELECT doc_id, n_tokens, n_distinct, max_tok_n,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(max_tok_n AS DOUBLE) / n_tokens END AS top_tok_frac,
         |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens END AS dup_ratio
         |FROM (
         |  SELECT doc_id,
         |    CAST(len($duckToks) AS INT) AS n_tokens,
         |    CAST(len(list_distinct($duckToks)) AS INT) AS n_distinct,
         |    $duckMaxTokNSql AS max_tok_n
         |  FROM documents) t""".stripMargin,
  )
}
