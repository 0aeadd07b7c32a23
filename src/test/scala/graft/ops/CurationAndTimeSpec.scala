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

  // --- k-means profile ----------------------------------------------------

  test("kmeans profile partitions the corpus across at most k buckets") {
    val rows = SimilarityQueries.embKmeans(spark, dir).collect()
    val n = Tables(spark, dir, "embeddings").count()
    assert(rows.length <= 8, "at most k buckets")
    assert(rows.map(_.getLong(1)).sum == n, "every vector assigned exactly once")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
