package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape specs for the time-series joins (as-of, range)
  * and the curation operators (stratified sample, sequence packing,
  * tf-idf, k-means profile).
  *
  * The plan assertions are the scale contract: the as-of join must be
  * join-FREE (union + one windowed pass — no candidate explosion), and the
  * range join must plan as an equi-join on the interval bucket, never a
  * cartesian/broadcast-nested-loop.
  */
class CurationAndTimeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // --- as-of join -------------------------------------------------------

  test("asof join matches each event to the latest purchase at-or-before it") {
    val out = RelationalQueries.asofJoin(spark, dir)
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS us", "p_event_id", "lag_us")
      .collect()
    val ev = Tables(spark, dir, "events")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.length == ev.length, "as-of is a left join: one row per event")
    out.foreach { r =>
      val (eid, uid, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val eligible = purchases.filter(p => p._2 == uid && p._4 <= ts)
      if (r.isNullAt(3)) assert(eligible.isEmpty, s"event $eid should have matched")
      else {
        val best = eligible.maxBy(p => (p._4, p._1))
        assert(r.getLong(3) == best._1, s"event $eid matched ${r.getLong(3)}, expected ${best._1}")
        assert(r.getLong(4) == ts - best._4, s"event $eid lag mismatch")
      }
    }
  }

  test("asof tie rules: inclusive match, max event_id among equal timestamps") {
    import spark.implicits._
    // user 7: two purchases at the SAME timestamp (ids 2 < 3), a click at
    // that exact timestamp, a later click, and an earlier click
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val before = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    val after = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val ev = Seq(
      (1L, 7L, "click", before, 0.0),
      (2L, 7L, "purchase", ts0, 10.0),
      (3L, 7L, "purchase", ts0, 30.0),
      (4L, 7L, "click", ts0, 0.0),
      (5L, 7L, "click", after, 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = RelationalQueries.asofFrom(ev).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out(1L) == -1L, "click before any purchase must not match")
    assert(out(4L) == 3L, "click AT the tied timestamp matches the max-id purchase")
    assert(out(5L) == 3L, "later click matches the max-id purchase")
    assert(out(2L) == 3L && out(3L) == 3L,
      "purchase rows self-match the tie winner (inclusive, max id)")
  }

  test("nearest asof: direction choice, backward tie preference, per-direction id rules") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (2L, 7L, "purchase", t(10), 20.0),
      (3L, 7L, "purchase", t(10), 30.0),
      (5L, 7L, "purchase", t(20), 50.0),
      (10L, 7L, "click", t(5), 0.0),   // no backward: forward to t=10, MIN id 2
      (11L, 7L, "click", t(10), 0.0),  // at-tie backward: MAX id 3, lag 0
      (12L, 7L, "click", t(14), 0.0),  // backward nearer (4 < 6): id 3
      (13L, 7L, "click", t(15), 0.0),  // equidistant: backward preferred, id 3
      (14L, 7L, "click", t(16), 0.0),  // forward nearer (4 < 6): id 5, lag -4s
      (20L, 8L, "click", t(50), 0.0)   // user with no purchases: null match
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = RelationalQueries.asofNearestFrom(ev).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(5))))).toMap
    assert(out(10L).contains((2L, -5000000L)), s"forward min-id: ${out(10L)}")
    assert(out(11L).contains((3L, 0L)), s"at-tie backward max-id: ${out(11L)}")
    assert(out(12L).contains((3L, 4000000L)), s"backward nearer: ${out(12L)}")
    assert(out(13L).contains((3L, 5000000L)), s"equidistant backward: ${out(13L)}")
    assert(out(14L).contains((5L, -4000000L)), s"forward nearer: ${out(14L)}")
    assert(out(20L).isEmpty, "no purchases at all: null match")
  }

  test("nearest asof plans join-free with ONE sort for both directions") {
    val df = RelationalQueries.asofNearest(spark, dir)
    val p = planString(df)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"nearest as-of must not plan as a join:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    val nSorts = "\\bSort \\[".r.findAllIn(finalPlan).length
    assert(nSorts <= 1, s"both window frames must share one sort, saw $nSorts:\n$finalPlan")
  }

  test("asof join plans join-free: one windowed pass, no join operator") {
    val p = planString(RelationalQueries.asofJoin(spark, dir))
    assert(p.contains("Window"), s"expected a window pass:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"as-of must not plan as a join:\n$p")
  }

  // --- range join -------------------------------------------------------

  test("range join equals the direct inequality join") {
    val out = RelationalQueries.rangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables(spark, dir, "events")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val w = 14400L * 1000000L
    val expected = ev.filter(_._3 == "click").flatMap { c =>
      val ps = ev.filter(p => p._3 == "purchase" && p._2 == c._2 &&
        p._4 > c._4 && p._4 <= c._4 + w)
      if (ps.isEmpty) None else Some((c._1, ps.length.toLong, ps.map(_._4 - c._4).min))
    }.toSet
    assert(out == expected)
  }

  test("range join plans as a bucketed equi-join, not a nested loop") {
    val p = planString(RelationalQueries.rangeJoin(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$p")
  }

  // --- stratified sampling ---------------------------------------------

  test("stratified sample is layout-independent and hits the configured rates") {
    val base = CurationQueries.sampleStratified(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    // same keep-set regardless of partitioning/ordering (hash-mod, not rand())
    val shuffled = Tables(spark, dir, "documents").repartition(7)
    val re = CurationQueries.sampleFrom(shuffled)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(base == re, "sample must be layout-independent")
    assert(base.nonEmpty)
    // every kept row satisfies its stratum threshold
    CurationQueries.sampleStratified(spark, dir).collect().foreach { r =>
      val rate = r.getString(1) match {
        case "en" => 10; case "de" => 30; case "fr" => 50; case _ => 70
      }
      assert(r.getInt(3) < rate, s"doc ${r.getLong(0)} violates its stratum rate")
    }
  }

  // --- sequence packing --------------------------------------------------

  test("packing reproduces sequential offset partitioning within each stratum") {
    val rows = CurationQueries.packSequences(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      var pos = Map.empty[Long, Int]
      docs.sortBy(_._2).foreach { case (_, docId, nTok, packId, packPos) =>
        val expected = cum / 2048
        assert(packId == expected, s"doc $docId pack $packId, expected $expected")
        val p = pos.getOrElse(expected, 0) + 1
        pos += expected -> p
        assert(packPos == p, s"doc $docId pos $packPos, expected $p")
        cum += nTok
      }
      // overflow bound: a pack exceeds the budget only by its straddling
      // document — every pack's START offset is inside its budget window
      docs.groupBy(_._4).foreach { case (pid, members) =>
        val startOffset = docs.filter(_._4 < pid).map(_._3).sum
        assert(startOffset / 2048 <= pid, s"pack $pid starts past its window")
      }
    }
  }

  test("parameterized surface: custom rates, budget, and shingle size behave") {
    // rates: a 0% default drops unlisted strata entirely
    val only = CurationQueries.sampleFrom(
      Tables(spark, dir, "documents"), Map("en" -> 100), default = 0).collect()
    assert(only.nonEmpty && only.forall(_.getString(1) == "en"))
    // budget: a tiny budget packs (almost) one document per pack
    val tiny = CurationQueries.packSequences(spark, dir, budget = 1L).collect()
    assert(tiny.forall(_.getInt(4) == 1), "budget=1: every doc starts its own pack")
    // shingle size: a longer shingle can only flag fewer or equal docs
    val n4 = TextQueries.decontaminate(spark, dir).collect().map(_.getLong(0)).toSet
    val n6 = TextQueries.decontaminate(spark, dir, n = 6).collect().map(_.getLong(0)).toSet
    assert(n6.subsetOf(n4), s"longer shingles flagged new docs: ${n6 -- n4}")
  }

  test("sampling rates keys are data, not SQL: quotes in a stratum key select, never parse") {
    import spark.implicits._
    val docs = Seq((1L, "o'brien", "s0"), (2L, "plain", "s0"))
      .toDF("doc_id", "lang", "source")
    // quoted key keeps everything in its stratum; everything else drops
    val kept = CurationQueries.sampleFrom(docs, Map("o'brien" -> 100), default = 0)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"quoted stratum key mishandled: $kept")
  }

  test("packing by (lang, shard) strata: independent per-shard sequences, bounded window partitions") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "pmod(doc_id, 2) AS shard",
        "CAST(10 + doc_id % 50 AS BIGINT) AS n_tok")
    val out = CurationQueries.packTokens(docs, budget = 64, strata = Seq("lang", "shard"))
    val rows = out.collect()
      .map(r => ((r.getString(1), r.getLong(2)), r.getLong(0), r.getLong(3), r.getLong(4), r.getInt(5)))
    // >1 window partition per language: both shards of each language present,
    // each starting its OWN pack sequence at 0
    rows.groupBy(_._1._1).foreach { case (lang, byLang) =>
      val shards = byLang.map(_._1._2).distinct.sorted
      assert(shards.toSeq == Seq(0L, 1L), s"lang $lang not split across shards: $shards")
    }
    // per-(lang, shard): the sequential offset-packing fold reproduces
    // pack_id and pack_pos exactly — sharding changes parallelism, not the
    // within-shard semantics
    rows.groupBy(_._1).foreach { case (stratum, docs2) =>
      var cum = 0L
      var pos = Map.empty[Long, Int]
      docs2.sortBy(_._2).foreach { case (_, docId, nTok, packId, packPos) =>
        val expected = cum / 64
        assert(packId == expected, s"$stratum doc $docId pack $packId, expected $expected")
        val p = pos.getOrElse(expected, 0) + 1
        pos += expected -> p
        assert(packPos == p, s"$stratum doc $docId pos $packPos, expected $p")
        cum += nTok
      }
      assert(docs2.exists(_._4 == 0L), s"$stratum does not start at pack 0")
    }
    // plan pin: the running-sum window partitions by BOTH strata columns
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(lang#\\d+, shard#\\d+".r.findFirstIn(p).isDefined,
      s"window must partition by (lang, shard):\n$p")
  }

  test("sampling kernel returns empty (not an error) on an empty corpus") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType))))
    assert(CurationQueries.sampleFrom(empty).collect().isEmpty)
  }

  // --- tf-idf -------------------------------------------------------------

  test("tfidf returns at most 3 ranked terms per document with sane counts") {
    val rows = TextQueries.tfidf(spark, dir).collect()
    val nDocs = Tables(spark, dir, "documents").count()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == nDocs)
    byDoc.values.foreach { terms =>
      assert(terms.length <= 3)
      assert(terms.map(_.getInt(4)).sorted.toSeq == (1 to terms.length))
      terms.foreach { t =>
        assert(t.getLong(2) >= 1 && t.getLong(3) >= 1 && t.getLong(3) <= nDocs)
      }
    }
  }

  // --- mixture upsampling --------------------------------------------------

  test("upsample emits dense epoch ranges at the configured rate regimes") {
    val rows = CurationQueries.upsample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val langOf = Tables(spark, dir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (docId, copies) =>
      val epochs = copies.map(_._3).sorted.toSeq
      assert(epochs == (0L until epochs.length).toSeq,
        s"doc $docId epochs not a dense 0-based range: $epochs")
      val expected = langOf(docId) match {
        case "en" => Set(1)        // 35%: emitted docs get exactly one copy
        case "de" => Set(1)        // 100%: exactly once
        case "fr" => Set(1, 2)     // 170%: once, 70% twice
        case _    => Set(2, 3)     // 250%: twice, 50% thrice
      }
      assert(expected.contains(epochs.length),
        s"doc $docId (${langOf(docId)}) emitted ${epochs.length} copies")
    }
    // every de (rate 100) and fr (rate >= 100) doc is present
    langOf.filter(kv => kv._2 == "de" || kv._2 == "fr").keys.foreach { id =>
      assert(byDoc.contains(id), s"doc $id (rate >= 100) must be emitted")
    }
    // fractional regimes actually exercise both branches at this corpus size
    val frCounts = byDoc.collect { case (id, c) if langOf(id) == "fr" => c.length }.toSeq
    assert(frCounts.contains(1) && frCounts.contains(2),
      "fr (170%) should show both 1- and 2-copy docs")
  }

  test("upsample is layout-independent, integer rates are exact, rate 0 drops") {
    val docs = Tables(spark, dir, "documents")
    val base = CurationQueries.upsampleFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val re = CurationQueries.upsampleFrom(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(base == re, "epoch stream must be layout-independent")
    val tripled = CurationQueries.upsampleFrom(docs, Map.empty, default = 300).collect()
    assert(tripled.groupBy(_.getLong(0)).values.forall(_.length == 3),
      "rate 300 emits exactly 3 copies, no fractional branch")
    assert(CurationQueries.upsampleFrom(docs, Map.empty, default = 0).collect().isEmpty,
      "rate 0 emits nothing")
  }

  test("upsample plans map-side: no shuffle exchange") {
    val df = CurationQueries.upsample(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"upsample must not shuffle:\n$p")
  }

  // --- deterministic shuffle-split ------------------------------------------

  test("shuffle split assigns every doc once with dense per-split sequences") {
    val rows = CurationQueries.shuffleSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    val n = Tables(spark, dir, "documents").count()
    assert(rows.length == n && rows.map(_._1).distinct.length == n,
      "every document exactly once")
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8), "split_id in [0, 8)")
    rows.groupBy(_._2).values.foreach { split =>
      assert(split.map(_._3).sorted.toSeq == (1 to split.length).toSeq,
        "seq must be dense 1-based within each split")
    }
    // layout-independence: assignment and order survive a repartition
    val re = CurationQueries.shuffleSplitFrom(
      Tables(spark, dir, "documents").repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).sorted.toSeq
    assert(re == rows.sorted.toSeq, "shuffle order must be layout-independent")
    // it's a shuffle: consecutive seq positions are not consecutive doc_ids
    val s0 = rows.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(s0.sliding(2).exists(p => p.length == 2 && p(1) != p(0) + 1),
      "hash order should not preserve doc_id order")
  }

  // --- duplicated n-gram coverage -------------------------------------------

  test("ngram dup coverage counts cross-document gram positions exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),     // grams: "a b c d", "b c d e"
      (2L, "x a b c d"),     // grams: "x a b c", "a b c d" (shared with 1)
      (3L, "p q r s"),       // gram:  "p q r s" (unique)
      (4L, "w x y")          // too short: no 4-grams, absent from output
    ).toDF("doc_id", "text")
    val out = TextQueries.ngramDupFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((2L, 1L, 0.5)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 0.5)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((1L, 0L, 0.0)), s"doc 3: ${out(3L)}")
    // a REPEATED gram inside one doc is not cross-document duplication
    val solo = Seq((9L, "a b c d a b c d a b c d")).toDF("doc_id", "text")
    val soloOut = TextQueries.ngramDupFrom(solo).collect()
    assert(soloOut.head.getLong(2) == 0L,
      "within-doc repetition must not count as duplication (nd counts DISTINCT docs)")
    // the pre-aggregated variant (the repetitive-corpus dial) is equivalent
    // — including on within-doc repeats, where its collapsed counts must
    // still weight every position
    val both = docs.union(solo)
    val a = TextQueries.ngramDupFrom(both).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val b = TextQueries.ngramDupFrom(both, preAggregate = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(a == b, "preAggregate must not change results")
  }

  // --- hashed linear quality model -------------------------------------------

  test("quality model reproduces the md5-bucket linear score exactly") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha")).toDF("doc_id", "text")
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(hex(0)) * 16 +
        "0123456789abcdef".indexOf(hex(1))) % TextQueries.ModelDim
    }
    def score(toks: Seq[String]): Long =
      toks.map(t => TextQueries.modelWeights(bucket(t))).sum
    val out = TextQueries.qualityModelFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    val s1 = score(Seq("alpha", "beta", "gamma"))
    val s2 = score(Seq("alpha", "alpha"))
    assert(out(1L) == ((3, s1, s1.toDouble / 3, if (s1 >= 0) "keep" else "drop")))
    assert(out(2L) == ((2, s2, s2.toDouble / 2, if (s2 >= 0) "keep" else "drop")))
    // the stand-in weight table stays in the documented band
    assert(TextQueries.modelWeights.forall(w => w >= -1000 && w <= 1000))
    assert(TextQueries.modelWeights.distinct.length > TextQueries.ModelDim / 2,
      "weights should not collapse to a few values")
  }

  test("quality model plans map-side: no shuffle exchange, no UDFs") {
    val df = TextQueries.qualityModel(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  // --- curation funnel -------------------------------------------------------

  test("curate verdicts name the first failing stage and agree with the component ops") {
    val rows = CurationQueries.curate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))
    val n = Tables(spark, dir, "documents").count()
    assert(rows.length == n, "one verdict per document")
    rows.foreach { case (id, d, m, p, v) =>
      val expected =
        if (d == 0) "near_dup"
        else if (m == 0) "low_quality"
        else if (p == 0) "repetitive"
        else "keep"
      assert(v == expected, s"doc $id verdict $v, flags ($d,$m,$p)")
    }
    // stage 1 agrees with the gate-verified pair op: later pair members fail
    val laterDups = DedupQueries.minhashLsh(spark, dir).collect()
      .map(_.getLong(1)).toSet
    rows.foreach { case (id, d, _, _, _) =>
      assert((d == 0) == laterDups.contains(id),
        s"doc $id pass_dedup=$d disagrees with minhash pairs")
    }
    // thresholds are dials: an impossible repetition bound fails everything
    // that reaches stage 3
    val strict = CurationQueries.curate(spark, dir, maxTopPct = -1L).collect()
    assert(strict.forall(r => r.getInt(4) == 0),
      "maxTopPct = -1 must fail the repetition stage for every doc")
  }

  // --- k-means profile ----------------------------------------------------

  test("kmeans profile partitions the corpus across at most k buckets") {
    val rows = SimilarityQueries.embKmeans(spark, dir).collect()
    val n = Tables(spark, dir, "embeddings").count()
    assert(rows.length <= 8, "at most k buckets")
    assert(rows.map(_.getLong(1)).sum == n, "every vector assigned exactly once")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
