package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupQueries
import graft.ops.Tables

/** Streaming fuzzy dedup: the incremental MinHash-LSH candidate stream must
  * agree with the batch banding it reuses, and its one-long-per-bucket state
  * must carry across micro-batches.
  */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ttl dedup: dropped inside the horizon, state evicted past it, late re-arrival re-emitted") {
    val tmp = Files.createTempDirectory("graft-sttl").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // 4 files + maxFilesPerTrigger=1 => 4 micro-batches (watermark advances
    // at batch END off the previous batch's max event time; expired state is
    // CLEANED one batch after the watermark passes it):
    //   b0: A@00:00, B@00:01           -> both first-seen; wm after b0 = 00:00
    //   b1: dup-A@00:00:30 (inside the 1-min horizon of A -> DROPPED),
    //       C@00:10 (advances wm to 00:09)
    //   b2: D@00:11 (filler: runs with wm 00:09, so A's state — expiry
    //       00:01 — is cleaned this batch; wm after = 00:10)
    //   b3: dup-A@00:10:30 -> state gone, RE-EMITTED (the documented trade)
    val textA = "alpha  beta"
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"), Seq(
      s"""{"doc_id": 1, "ts": "2024-01-01T00:00:00.000Z", "text": "$textA"}""",
      """{"doc_id": 2, "ts": "2024-01-01T00:01:00.000Z", "text": "gamma"}""")
      .mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      s"""{"doc_id": 3, "ts": "2024-01-01T00:00:30.000Z", "text": "Alpha Beta"}""",
      """{"doc_id": 4, "ts": "2024-01-01T00:10:00.000Z", "text": "delta"}""")
      .mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b2.jsonl"), Seq(
      """{"doc_id": 6, "ts": "2024-01-01T00:11:00.000Z", "text": "epsilon"}""")
      .mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b3.jsonl"), Seq(
      s"""{"doc_id": 5, "ts": "2024-01-01T00:10:30.000Z", "text": "ALPHA beta"}""")
      .mkString("\n"))
    // FileStreamSource orders pending files by MODIFICATION TIME — writes
    // landing in the same clock tick would make batch order (and thus the
    // watermark progression) nondeterministic; pin it explicitly
    Seq("b0", "b1", "b2", "b3").zipWithIndex.foreach { case (f, i) =>
      Files.setLastModifiedTime(java.nio.file.Paths.get(s"$tmp/in/$f.jsonl"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val q = StreamingDedup.ttlDedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"),
        delay = "1 minute")
      .writeStream.format("memory").queryName("sttl").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("sttl").collect().map(_.getLong(0)).toSet
    val wms = q.recentProgress.map(p =>
      s"batch=${p.batchId} wm=${p.eventTime.get("watermark")} rows=${p.numInputRows}").mkString("; ")
    assert(out == Set(1L, 2L, 4L, 6L, 5L),
      s"expected in-horizon dup 3 dropped and post-eviction dup 5 re-emitted, got $out ($wms)")
  }

  test("stateless band rows equal the batch groupBy signature build") {
    val docs = Tables(spark, dir, "documents")
    val stateless = DedupQueries.bandRowsStateless(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // the batch path: shingled frame -> exploded postings -> partial-agg min
    val shingled = docs.selectExpr("doc_id",
      """CASE WHEN size(split(trim(text), '\\s+')) < 3
        |THEN CAST(array() AS ARRAY<STRING>)
        |ELSE array_distinct(transform(
        |  sequence(1, size(split(trim(text), '\\s+')) - 2),
        |  i -> concat_ws(' ',
        |    element_at(split(trim(text), '\\s+'), i),
        |    element_at(split(trim(text), '\\s+'), i + 1),
        |    element_at(split(trim(text), '\\s+'), i + 2)))) END AS shs""".stripMargin)
    val batch = DedupQueries.minhashBandRows(shingled)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(stateless == batch, "streaming signature build diverged from batch")
    assert(stateless.nonEmpty)
  }

  test("streaming candidates: within-batch and cross-batch collisions against the anchor") {
    val tmp = Files.createTempDirectory("graft-sfuzzy").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight nine"
    val textC = "completely different words nothing shared here at all"
    // batch 0: doc 1 (original A), doc 2 (exact within-batch dup of A), doc 5 (B)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"), Seq(
      s"""{"doc_id": 1, "text": "$textA"}""",
      s"""{"doc_id": 2, "text": "$textA"}""",
      s"""{"doc_id": 5, "text": "$textB"}""").mkString("\n"))
    // batch 1: doc 7 (cross-batch dup of A), doc 8 (unique), doc 9 (dup of B)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      s"""{"doc_id": 7, "text": "$textA"}""",
      s"""{"doc_id": 8, "text": "$textC"}""",
      s"""{"doc_id": 9, "text": "$textB"}""").mkString("\n"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .json(s"$tmp/in")
    val q = StreamingDedup.minhashCandidates(stream).toDF()
      .writeStream.format("memory").queryName("sfuzzy").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val pairs = spark.table("sfuzzy")
      .select(col("doc_id"), col("anchor")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ids arrive in increasing order, so the flagged set is exactly "docs
    // with an earlier band-mate" and every anchor is the bucket min
    assert(pairs == Set((2L, 1L), (7L, 1L), (9L, 5L)),
      s"candidate pairs: $pairs")

    // agreement with the static computation on the union: flagged docs =
    // docs sharing a (band, sig) bucket with a smaller doc_id
    import spark.implicits._
    val static = Seq((1L, textA), (2L, textA), (5L, textB), (7L, textA),
      (8L, textC), (9L, textB)).toDF("doc_id", "text")
    val buckets = DedupQueries.bandRowsStateless(static)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
    val expectedFlagged = buckets.groupBy(_._2).values
      .flatMap { bucket => val ids = bucket.map(_._1); ids.filter(_ != ids.min) }
      .toSet
    assert(pairs.map(_._1) == expectedFlagged,
      s"streaming flagged ${pairs.map(_._1)}, static expects $expectedFlagged")
  }

  test("streaming winnow candidates: partial overlap collides within and across batches; cap bounds a hot fingerprint") {
    val run = "r1 r2 r3 r4 r5 r6 r7" // 7 shared tokens >= k+w-1 = 6
    val tmp = Files.createTempDirectory("graft-swinnow").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // batch 0: doc 1 carries the run mid-document, doc 2 at a different
    // offset (within-batch), doc 5 shares nothing
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"), Seq(
      s"""{"doc_id": 1, "text": "a1 a2 $run a3"}""",
      s"""{"doc_id": 2, "text": "b1 $run b2 b3"}""",
      s"""{"doc_id": 5, "text": "c1 c2 c3 c4 c5 c6 c7 c8"}""").mkString("\n"))
    // batch 1: doc 7 carries the run at yet another offset (cross-batch)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      s"""{"doc_id": 7, "text": "d1 d2 d3 $run"}""",
      s"""{"doc_id": 8, "text": "e1 e2 e3 e4 e5 e6 e7 e8"}""").mkString("\n"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def runQuery(name: String, cap: Int): Set[(Long, Long)] = {
      val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(s"$tmp/in")
      val q = StreamingDedup.winnowCandidates(stream, maxEmitsPerFp = cap).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt-$name")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table(name).select(col("doc_id"), col("anchor")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val pairs = runQuery("swinnow", cap = 50)
    // the winnowing guarantee: the shared >= 6-token run collides both docs
    // with the anchor; the non-overlapping docs stay silent
    assert(pairs == Set((2L, 1L), (7L, 1L)), s"candidates: $pairs")
    // static cross-check: flagged docs = docs sharing a winnow fingerprint
    // with a smaller doc on the union corpus
    import spark.implicits._
    val static = Seq((1L, s"a1 a2 $run a3"), (2L, s"b1 $run b2 b3"),
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8"), (7L, s"d1 d2 d3 $run"),
      (8L, "e1 e2 e3 e4 e5 e6 e7 e8")).toDF("doc_id", "text")
    val fps = graft.ops.TextQueries.winnowFrom(static)
      .select(col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = fps.groupBy(_._2).values
      .flatMap { b => val ids = b.map(_._1).distinct; ids.filter(_ != ids.min) }.toSet
    assert(pairs.map(_._1) == expected,
      s"streaming flagged ${pairs.map(_._1)}, static winnow expects $expected")
    // the hot-fingerprint cap: at 1 emit per fp, doc 2 exhausts every
    // shared fingerprint's budget within batch 0, so doc 7 is suppressed
    val capped = runQuery("swinnowcap", cap = 1)
    assert(capped == Set((2L, 1L)), s"capped candidates: $capped")
  }

  test("streaming substring extraction equals the batch kernel in static mode (constructed corpus)") {
    // the overlap corpus satisfies both preconditions of the equality claim:
    // no k-gram repeats inside a shared region, and every fingerprint is
    // carried by at most the two sides of its pair
    val docs = DedupQueries.overlapCorpus(spark, dir)
    val got = StreamingDedup.substringCandidates(docs)
      .collect().map(r => (r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len)).toSet
    val wantByName = DedupQueries.dedupSubstringFrom(docs).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("start_a"),
        r.getAs[Int]("start_b"), r.getAs[Int]("run_len"))
    }.toSet
    assert(got == wantByName && got.nonEmpty,
      s"streaming extraction diverged: ${got.diff(wantByName).take(3)} extra, " +
        s"${wantByName.diff(got).take(3)} missing (of ${wantByName.size})")
  }

  test("streaming substring extraction recovers a planted run across micro-batches") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8" // 8 shared tokens >= k+w-1 = 6
    val tmp = Files.createTempDirectory("graft-ssubstr").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // batch 0: the anchor carries the run after a 2-token prefix
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"), Seq(
      s"""{"doc_id": 1, "text": "a1 a2 $run a3"}""",
      s"""{"doc_id": 5, "text": "c1 c2 c3 c4 c5 c6 c7 c8"}""").mkString("\n"))
    // batch 1: the later side carries it after a 3-token prefix
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      s"""{"doc_id": 7, "text": "d1 d2 d3 $run"}""").mkString("\n"))
    Seq("b0", "b1").zipWithIndex.foreach { case (f, i) =>
      Files.setLastModifiedTime(java.nio.file.Paths.get(s"$tmp/in/$f.jsonl"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = StreamingDedup.substringCandidates(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"))
      .toDF()
      .writeStream.format("memory").queryName("ssubstr").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val runs = spark.table("ssubstr").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    // the maximal shared run: doc 1 tokens 3..10, doc 7 tokens 4..11, len 8;
    // doc 5 shares nothing and must stay silent
    assert(runs == Set((1L, 7L, 3, 4, 8)), s"recovered runs: $runs")
  }

  test("pointer kernel + offline extend recover FULL runs where the bounded window clips") {
    // the long corpus plants 30-50-token shared runs; a ctx = 8 bounded
    // window can only ever emit k + 2*ctx = 19 tokens of any of them
    val docs = DedupQueries.overlapLongCorpus(spark, dir)
    val clipped = StreamingDedup.substringCandidates(docs, ctxTokens = 8)
      .collect().map(_.run_len)
    assert(clipped.nonEmpty && clipped.max == 19,
      s"expected every windowed run clipped at 19, got max ${clipped.max}")
    // the pointer/offline split has no cap: resolved distinct runs equal
    // the batch kernel row-for-row, full 30+-token runs included
    val ptrs = StreamingDedup.substringPointerCandidates(docs).toDF()
    val got = DedupQueries.resolveSubstringPointers(ptrs, docs).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("start_a"),
        r.getAs[Int]("start_b"), r.getAs[Int]("run_len"))
    }.toSet
    val want = DedupQueries.dedupSubstringFrom(docs).collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("start_a"),
        r.getAs[Int]("start_b"), r.getAs[Int]("run_len"))
    }.toSet
    assert(got == want && got.exists(_._5 >= 30),
      s"pointer resolution diverged: ${got.diff(want).take(3)} extra, " +
        s"${want.diff(got).take(3)} missing (of ${want.size}); " +
        s"max run ${if (got.nonEmpty) got.map(_._5).max else -1}")
  }

  test("streaming span rewrite equals the batch rewrite on affected docs (static mode)") {
    val docs = DedupQueries.overlapCorpus(spark, dir)
    // single static batch: arrival order within each bucket is doc_id order,
    // so the arrival-order drop rule coincides with the batch id-order rule
    val spans = StreamingDedup.substringSpans(docs).toDF()
    val got = StreamingDedup.spanRewrite(spans)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val want = DedupQueries.dedupSubstringRewriteFrom(docs)
      .filter(col("n_removed") > 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == want && got.nonEmpty,
      s"span rewrite diverged from the batch kernel: ${got.diff(want).take(2)} extra, " +
        s"${want.diff(got).take(2)} missing (of ${want.size})")
  }

  test("streaming span rewrite: a cross-batch arrival loses exactly the planted span") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val tmp = Files.createTempDirectory("graft-srewrite").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"),
      s"""{"doc_id": 1, "text": "a1 a2 $run a3"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"),
      s"""{"doc_id": 7, "text": "d1 d2 d3 $run"}""")
    Seq("b0", "b1").zipWithIndex.foreach { case (f, i) =>
      Files.setLastModifiedTime(java.nio.file.Paths.get(s"$tmp/in/$f.jsonl"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = StreamingDedup.substringSpans(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"))
      .toDF()
      .writeStream.format("memory").queryName("srewrite").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the foreachBatch body, applied to the captured span stream
    val rewritten = StreamingDedup.spanRewrite(spark.table("srewrite"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rewritten.toSeq == Seq((7L, 11, 8, "d1 d2 d3")),
      s"cross-batch rewrite: ${rewritten.toSeq} (anchor doc 1 must keep its copy, " +
        "doc 7 must lose exactly the 8-token planted run)")
  }

  test("in-stream verification: matching-minhash estimate, threshold suppression, no text in state") {
    import graft.ops.DedupQueries.MinHashConfig
    val tmp = Files.createTempDirectory("graft-sverify").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textA2 = "alpha beta gamma delta epsilon zeta eta iota" // near-dup of A
    // batch 0: the original; batch 1: an exact copy and a near-copy
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"),
      s"""{"doc_id": 1, "text": "$textA"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      s"""{"doc_id": 4, "text": "$textA"}""",
      s"""{"doc_id": 9, "text": "$textA2"}""").mkString("\n"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .json(s"$tmp/in")
    val q = StreamingDedup.minhashVerifiedCandidates(stream).toDF()
      .writeStream.format("memory").queryName("sverify").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("sverify")
      .select(col("doc_id"), col("anchor"), col("est_jaccard")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact copy: every minhash component agrees
    assert(got((4L, 1L)) == 1.0, s"exact copy must estimate 1.0: $got")
    // near-copy: the estimate equals the statically-computed matching
    // fraction of the two signature arrays (collision implies > 0)
    import spark.implicits._
    val static = Seq((1L, textA), (9L, textA2)).toDF("doc_id", "text")
    val sigs = graft.ops.DedupQueries.bandRowsStatelessWithSig(static)
      .select(col("doc_id"), col("mhs")).distinct()
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val k = MinHashConfig().k
    val expected = sigs(1L).zip(sigs(9L)).count(p => p._1 == p._2).toDouble / k
    assert(got.contains((9L, 1L)) && got((9L, 1L)) == expected,
      s"near-dup estimate ${got.get((9L, 1L))}, static expects $expected")
    assert(expected > 0.0 && expected < 1.0,
      "the near-dup fixture should land strictly between 0 and 1")

    // threshold suppression: rerun demanding more similarity than the
    // near-dup has — only the exact copy survives
    val tmp2 = Files.createTempDirectory("graft-sverify2").toString
    val q2 = StreamingDedup.minhashVerifiedCandidates(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"),
      minEstJaccard = (expected + 1.0) / 2)
      .toDF()
      .writeStream.format("memory").queryName("sverify2").outputMode("append")
      .option("checkpointLocation", s"$tmp2/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val kept = spark.table("sverify2")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"threshold should keep only the exact copy: $kept")
  }

  test("bloom dedup equals exact first-seen dedup when the filter is sized right") {
    // static frame: flatMapGroupsWithState runs in batch mode, one "batch"
    val docs = Tables(spark, dir, "documents")
    val accepted = StreamingDedup.bloomDedup(docs)
      .collect().map(_.doc_id).toSet
    val keepers = DedupQueries.dedupExact(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(accepted == keepers,
      "at 16x65536 bits vs a few hundred docs, FP ~ 0: bloom must equal exact")
  }

  test("bloom dedup drops cross-batch repeats; state is the fixed bit array") {
    val tmp = Files.createTempDirectory("graft-sbloom").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"), Seq(
      """{"doc_id": 1, "text": "alpha beta gamma"}""",
      """{"doc_id": 2, "text": "alpha beta gamma"}""",
      """{"doc_id": 3, "text": "one two three"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"), Seq(
      """{"doc_id": 7, "text": "ALPHA   beta gamma"}""",
      """{"doc_id": 8, "text": "novel words entirely"}""").mkString("\n"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = StreamingDedup.bloomDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"))
      .toDF()
      .writeStream.format("memory").queryName("sbloom").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sbloom").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // 2 is a within-batch dup of 1; 7 is a cross-batch dup of 1 AFTER the
    // same normalization dedup_exact applies (case + whitespace)
    assert(got == Set(1L, 3L, 8L), s"expected first-seen {1, 3, 8}, got $got")
  }

  test("bounded anchor window: edges, offsets, and the 2*ctx+k cap") {
    val tks = (1 to 20).map(i => s"t$i").toArray
    // interior gram at 1-based pos 10, k=3, ctx=2: window t8..t14, offset 7
    val (w1, o1) = StreamingDedup.anchorWindow(tks, 10, 3, 2)
    assert(o1 == 7 && w1.toSeq == (8 to 14).map(i => s"t$i"),
      s"interior window: off=$o1 win=${w1.toSeq}")
    assert(w1.length == 3 + 2 * 2, "interior window is exactly k + 2*ctx")
    // left edge: the window clips at the document start
    val (w2, o2) = StreamingDedup.anchorWindow(tks, 1, 3, 2)
    assert(o2 == 0 && w2.toSeq == (1 to 5).map(i => s"t$i"),
      s"left-edge window: off=$o2 win=${w2.toSeq}")
    // right edge: the window clips at the document end
    val (w3, o3) = StreamingDedup.anchorWindow(tks, 18, 3, 2)
    assert(o3 == 15 && w3.toSeq == (16 to 20).map(i => s"t$i"),
      s"right-edge window: off=$o3 win=${w3.toSeq}")
  }

  test("bounded anchor window clips emitted runs at k + 2*ctx, in true document coordinates") {
    import spark.implicits._
    // a 30-token planted run: far longer than the ctx=6 window can extend
    val run = (1 to 30).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $run a3"),
      (7L, s"d1 d2 d3 $run")).toDF("doc_id", "text")
    val toks1 = s"a1 a2 $run a3".split(' ')
    val toks7 = s"d1 d2 d3 $run".split(' ')
    val got = StreamingDedup.substringCandidates(docs, ctxTokens = 6)
      .collect().map(r => (r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len))
    assert(got.nonEmpty, "the planted run must surface candidates")
    got.foreach { case (da, db, sa, sb, len) =>
      assert(da == 1L && db == 7L, s"orientation: ($da,$db)")
      // the cap: extension stops at the window edge on the anchor side
      assert(len <= 3 + 2 * 6, s"run_len $len exceeds k + 2*ctx = 15")
      assert(len >= 6, s"run_len $len below minL")
      // document coordinates: the reported span must be a REAL shared run
      val (ta, tb) = (toks1.slice(sa - 1, sa - 1 + len), toks7.slice(sb - 1, sb - 1 + len))
      assert(ta.sameElements(tb) && ta.length == len,
        s"span at ($sa,$sb,len=$len) is not a shared substring: ${ta.toSeq} vs ${tb.toSeq}")
    }
    // a window covering the whole document reproduces the full maximal run
    val full = StreamingDedup.substringCandidates(docs, ctxTokens = 200)
      .collect().map(r => (r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len)).toSet
    assert(full == Set((1L, 7L, 3, 4, 30)), s"uncapped recovery: $full")
  }

  test("bloom dedup false positives only ever DROP novel docs, never pass dups") {
    import spark.implicits._
    // 200 distinct docs through one 64-bit shard: heavy saturation — many
    // false positives, but every accepted doc must still be a first-seen
    // distinct text, and repeats of ACCEPTED docs must still be dropped
    val docs = (1 to 200).map(i => (i.toLong, s"unique document number $i"))
    val dup = docs.take(10).map { case (id, t) => (id + 1000, t) }
    val frame = (docs ++ dup).toDF("doc_id", "text")
    val out = StreamingDedup.bloomDedup(frame, shards = 1, bitsPerShard = 64)
      .collect().map(_.doc_id).toSet
    assert(out.nonEmpty && out.size < 200, s"64 bits must saturate: ${out.size}")
    assert(out.forall(_ <= 200), "a duplicate (id > 1000) must never be accepted")
  }
}
