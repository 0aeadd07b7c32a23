package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Scale-path specs: salted skew join equivalence, and the Structured
  * Streaming operator surface (tumbling windows + watermark) over the events
  * shape.
  */
class SkewAndStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of the large side hits one hot key
    val large = (0 until 2000).map(i => (if (i % 10 == 0) i % 7 else 1, s"row$i")).toDF("k", "v")
    val small = (0 until 7).map(i => (i, s"dim$i")).toDF("k", "d")
    val plain = large.join(small, Seq("k")).select("k", "v", "d")
    val salted = SkewJoin.saltedInnerJoin(large, small, "k").select("k", "v", "d")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads exact-duplicate hot-key rows and rejects salt-name collisions") {
    import spark.implicits._
    // all large-side rows are IDENTICAL — content-only salting would put
    // every one of them in a single bucket
    val large = (0 until 500).map(_ => (1, "samerow")).toDF("k", "v")
    val small = Seq((1, "dim1"), (2, "dim2")).toDF("k", "d")
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", saltBuckets = 8)
    assert(salted.count() == 500)
    // a pre-existing column with the salt's name must be rejected, not overwritten
    val clash = large.withColumn("__graft_salt_", lit(0))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(clash, small, "k")
    }
  }

  test("hot-key observation finds the dominant key") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (if (i % 5 == 0) i % 3 else 99, i)).toDF("k", "v")
    val top = SkewJoin.hotKeys(df, "k", 1).collect()
    assert(top.head.getInt(0) == 99)
  }

  test("streaming schema evolution: batch 2 widens a scalar to a choice, sink migrates") {
    import graft.streaming.StreamingRelationalize
    val tmp = Files.createTempDirectory("graft-evolve").toString
    val inDir = s"$tmp/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    val batch1 = Seq("""{"id": 1, "v": 10}""", """{"id": 2, "v": 20}""")
    val batch2 = Seq("""{"id": 3, "v": "s3", "w": true}""")

    // run 1: v is a plain int column
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part0.jsonl"), batch1.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)
    assert(StreamingRelationalize.readTable(spark, s"$tmp/out", "t").columns.sorted.toSeq == Seq("id", "v"))

    // run 2 (restart, same checkpoint): v widens to c-int-str, w appears ->
    // the already-written parquet must be migrated before the append
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part1.jsonl"), batch2.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)

    val streamed = StreamingRelationalize.readTable(spark, s"$tmp/out", "t")
    assert(streamed.columns.sorted.toSeq == Seq("id", "v_int", "v_str", "w"))

    // the evolved sink must equal a batch run over the full corpus
    val batchRun = graft.relationalize.RelationalizeSpark(
      graft.sources.Sources.fromIterable(spark, batch1 ++ batch2), "t")("t")
    val key: org.apache.spark.sql.Row => String = _.toSeq.map(String.valueOf).mkString("|")
    assert(batchRun.columns.sorted.toSeq == streamed.columns.sorted.toSeq)
    val cols = streamed.columns.sorted.map(col)
    assert(streamed.select(cols: _*).collect().map(key).sorted.toSeq ==
      batchRun.select(cols: _*).collect().map(key).sorted.toSeq)

    // the drift LOG recorded exactly this evolution, with the lattice
    // verdicts: v retyped int -> c-int-str (widening), w added (widening)
    val drift = StreamingRelationalize.readDriftLog(spark, s"$tmp/out", "t")
      .collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4),
        r.getString(5), r.getBoolean(6))).toSet
    assert(drift == Set(
      ("v", "retyped", "int", "c-int-str", true),
      ("w", "added", null, "bool", true)),
      s"drift log mismatch: $drift")
    // batch 1 created the table (no prior) — no drift rows for it
    val batches = StreamingRelationalize.readDriftLog(spark, s"$tmp/out", "t")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batches.size == 1, s"expected drift only from the widening batch: $batches")
  }

  test("interrupted migration swap: every crash state self-heals") {
    import graft.streaming.StreamingRelationalize.{recoverInterruptedMigration => recover, MigratingSuffix, RetiredSuffix}
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(dir: String, marker: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(dir))
      Files.writeString(java.nio.file.Paths.get(s"$dir/$marker"), marker)
    }
    def only(dir: String): String =
      new java.io.File(dir).listFiles().map(_.getName).mkString(",")

    // crash between the two renames: live missing, rewrite + retired present
    val t1 = Files.createTempDirectory("graft-mig1").toString + "/t"
    mk(t1 + MigratingSuffix, "new"); mk(t1 + RetiredSuffix, "old")
    recover(fs, t1)
    assert(only(t1) == "new", "must roll FORWARD to the completed rewrite")
    assert(!fs.exists(new Path(t1 + MigratingSuffix)) && !fs.exists(new Path(t1 + RetiredSuffix)))

    // defensive state: only the retired copy survives — roll back
    val t2 = Files.createTempDirectory("graft-mig2").toString + "/t"
    mk(t2 + RetiredSuffix, "old")
    recover(fs, t2)
    assert(only(t2) == "old", "must restore the retired copy")

    // crash mid-rewrite: live intact, half-written tmp discarded
    val t3 = Files.createTempDirectory("graft-mig3").toString + "/t"
    mk(t3, "live"); mk(t3 + MigratingSuffix, "partial")
    recover(fs, t3)
    assert(only(t3) == "live" && !fs.exists(new Path(t3 + MigratingSuffix)))

    // crash after the swap: stale retired dropped
    val t4 = Files.createTempDirectory("graft-mig4").toString + "/t"
    mk(t4, "live"); mk(t4 + RetiredSuffix, "old")
    recover(fs, t4)
    assert(only(t4) == "live" && !fs.exists(new Path(t4 + RetiredSuffix)))
  }

  test("migration crash injected between the renames: next batch self-heals") {
    import graft.streaming.StreamingRelationalize
    import org.apache.hadoop.fs.Path
    val tmp = Files.createTempDirectory("graft-crash1").toString
    val inDir = s"$tmp/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    val batch1 = Seq("""{"id": 1, "v": 10}""", """{"id": 2, "v": 20}""")
    val batch2 = Seq("""{"id": 3, "v": "s3"}""")
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part0.jsonl"), batch1.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)

    // fabricate the between-renames crash: live moved aside, rewrite present
    val fs = new Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(s"$tmp/out/t")
    fs.rename(live, new Path(s"$tmp/out/t${StreamingRelationalize.RetiredSuffix}"))
    // the completed rewrite (same narrow layout is fine: recovery only swaps)
    fs.mkdirs(live.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$tmp/out/t${StreamingRelationalize.RetiredSuffix}"),
      fs, new Path(s"$tmp/out/t${StreamingRelationalize.MigratingSuffix}"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(live))

    // next batch: recovery rolls the rewrite forward, then the widening
    // migrates it and appends
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part1.jsonl"), batch2.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)

    val streamed = StreamingRelationalize.readTable(spark, s"$tmp/out", "t")
    val batchRun = graft.relationalize.RelationalizeSpark(
      graft.sources.Sources.fromIterable(spark, batch1 ++ batch2), "t")("t")
    val cols = batchRun.columns.sorted.map(col)
    val key: org.apache.spark.sql.Row => String = _.toSeq.map(String.valueOf).mkString("|")
    assert(streamed.columns.sorted.toSeq == batchRun.columns.sorted.toSeq)
    assert(streamed.select(cols: _*).collect().map(key).sorted.toSeq ==
      batchRun.select(cols: _*).collect().map(key).sorted.toSeq)
    assert(!fs.exists(new Path(s"$tmp/out/t${StreamingRelationalize.RetiredSuffix}")))
    assert(!fs.exists(new Path(s"$tmp/out/t${StreamingRelationalize.MigratingSuffix}")))
  }

  test("re-migration under a stale schema store is an identity rewrite, not data loss") {
    import graft.streaming.StreamingRelationalize
    val tmp = Files.createTempDirectory("graft-crash2").toString
    val inDir = s"$tmp/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    val batch1 = Seq("""{"id": 1, "v": 10}""", """{"id": 2, "v": 20}""")
    val batch2 = Seq("""{"id": 3, "v": "s3"}""")
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part0.jsonl"), batch1.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)
    val oldSchema = StreamingRelationalize.SchemaStore.load(spark, s"$tmp/out", "t").get

    // simulate: a widening batch migrated the files but crashed before the
    // schema store was updated and before its append — files are already in
    // the NEW layout, the store still says the old one
    val docs23 = graft.relationalize.RelationalizeSpark(
      graft.sources.Sources.fromIterable(spark, batch1 ++ batch2), "t")
    val wide = docs23.schemas("t")
    StreamingRelationalize.migrateParquet(spark, s"$tmp/out/t", oldSchema, wide)
    assert(StreamingRelationalize.readTable(spark, s"$tmp/out", "t").columns.contains("v_int"))

    // replayed batch: the stale store re-triggers the migration over the
    // already-migrated files — must keep the moved values, not null them
    Files.writeString(java.nio.file.Paths.get(s"$inDir/part1.jsonl"), batch2.mkString("\n"))
    StreamingRelationalize.runToParquetEvolving(
      spark.readStream.textFile(inDir), "t", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination(60000)

    val streamed = StreamingRelationalize.readTable(spark, s"$tmp/out", "t")
    val batchRun = docs23("t")
    val cols = batchRun.columns.sorted.map(col)
    val key: org.apache.spark.sql.Row => String = _.toSeq.map(String.valueOf).mkString("|")
    assert(streamed.columns.sorted.toSeq == batchRun.columns.sorted.toSeq)
    assert(streamed.select(cols: _*).collect().map(key).sorted.toSeq ==
      batchRun.select(cols: _*).collect().map(key).sorted.toSeq)
  }

  test("replayed batch after its sink write is idempotent (no duplicate rows)") {
    // foreachBatch's at-least-once window: a crash AFTER the write but
    // BEFORE the checkpoint commit replays the whole batch. Batch-id
    // subpaths + Overwrite must make the replay a no-op — including for a
    // WIDENING batch, whose replay must skip the (already done) migration
    // and re-overwrite only its own subpath.
    import graft.streaming.StreamingRelationalize
    val tmp = Files.createTempDirectory("graft-replay").toString
    val batch1 = Seq("""{"id": 1, "v": 10}""", """{"id": 2, "v": 20}""")
    val batch2 = Seq("""{"id": 3, "v": "s3", "w": true}""")
    val ds1 = graft.sources.Sources.fromIterable(spark, batch1)
    val ds2 = graft.sources.Sources.fromIterable(spark, batch2)

    StreamingRelationalize.processEvolvingBatch(ds1, 0L, "t", s"$tmp/out")
    StreamingRelationalize.processEvolvingBatch(ds1, 0L, "t", s"$tmp/out") // replay
    assert(StreamingRelationalize.readTable(spark, s"$tmp/out", "t").count() == 2,
      "replayed batch duplicated rows")

    // widening batch (v int -> c-int-str, w appears), then its replay
    StreamingRelationalize.processEvolvingBatch(ds2, 1L, "t", s"$tmp/out")
    StreamingRelationalize.processEvolvingBatch(ds2, 1L, "t", s"$tmp/out") // replay
    val streamed = StreamingRelationalize.readTable(spark, s"$tmp/out", "t")
    val batchRun = graft.relationalize.RelationalizeSpark(
      graft.sources.Sources.fromIterable(spark, batch1 ++ batch2), "t")("t")
    val key: org.apache.spark.sql.Row => String = _.toSeq.map(String.valueOf).mkString("|")
    assert(streamed.columns.sorted.toSeq == batchRun.columns.sorted.toSeq)
    val cols = streamed.columns.sorted.map(col)
    assert(streamed.select(cols: _*).collect().map(key).sorted.toSeq ==
      batchRun.select(cols: _*).collect().map(key).sorted.toSeq,
      "replayed widening batch diverged from the batch run")
  }

  test("streaming tumbling-window aggregation with watermark over events JSONL") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-swin").toString
    val rows = (0 until 120).map { i =>
      val minute = i / 10
      f"""{"user_id": ${i % 3}, "ts": "2024-01-01T00:$minute%02d:${i % 10 * 5}%02d.000Z", "value": 1.0}"""
    }
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/events.jsonl"), rows.mkString("\n"))

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).json(s"$tmp/in")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory").queryName("win_counts").outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = spark.table("win_counts")
      .select(col("window.start").cast("string").as("w"), col("user_id"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batch equivalent
    val expected = spark.read.schema(schema).json(s"$tmp/in")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("user_id"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("stateful streaming: flatMapGroupsWithState running count across micro-batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-state").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // two files + maxFilesPerTrigger=1 => two micro-batches; state must carry over
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"),
      Seq("""{"user_id": 1}""", """{"user_id": 2}""", """{"user_id": 1}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"),
      Seq("""{"user_id": 1}""", """{"user_id": 2}""").mkString("\n"))

    val schema = StructType(Seq(StructField("user_id", LongType)))
    val counts = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in")
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          Iterator.single((user, total))
      }
    val q = counts.toDF("user_id", "running")
      .writeStream.format("memory").queryName("state_counts").outputMode("update")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // last update per user reflects the cumulative count across both batches
    val finalCounts = spark.table("state_counts")
      .groupBy(col("user_id")).agg(max(col("running")).as("running"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == Map(1L -> 3L, 2L -> 2L))
  }

  test("streaming exact dedup suppresses duplicates across micro-batches") {
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // two files + maxFilesPerTrigger=1 => two micro-batches; the batch-1
    // duplicate of doc 1 must be dropped by dedup STATE, not within-batch
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"),
      Seq("""{"doc_id": 1, "text": "alpha  beta"}""",
        """{"doc_id": 2, "text": "gamma"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"),
      Seq("""{"doc_id": 3, "text": "Alpha Beta"}""",
        """{"doc_id": 4, "text": "delta"}""").mkString("\n"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // same normalization as text_fingerprint / dedup_exact
    val deduped = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .json(s"$tmp/in")
      .withColumn("fp",
        expr("md5(CAST(regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS BINARY))"))
      .dropDuplicates("fp")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val out = spark.table("sdedup").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size == 3, s"expected 3 survivors, got $out")
    assert(out.keySet == Set(1L, 2L, 4L), s"batch-0 survivor must win: $out")
    assert(out.values.toSeq.distinct.size == 3)
  }

  test("streaming session_window aggregation equals the batch computation") {
    val tmp = Files.createTempDirectory("graft-sesswin").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // user 1: two sessions separated by >5 min; user 2: one session
    val rows = Seq(
      """{"user_id": 1, "ts": "2024-01-01T00:00:00.000Z"}""",
      """{"user_id": 1, "ts": "2024-01-01T00:02:00.000Z"}""",
      """{"user_id": 1, "ts": "2024-01-01T00:30:00.000Z"}""",
      """{"user_id": 2, "ts": "2024-01-01T00:01:00.000Z"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/events.jsonl"), rows.mkString("\n"))

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").cast("string").as("s"),
        col("user_id"), col("n"))

    val q = sessions(spark.readStream.schema(schema).json(s"$tmp/in")
        .withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sess_counts").outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = spark.table("sess_counts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = sessions(spark.read.schema(schema).json(s"$tmp/in")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.size == 3,
      s"streaming sessions $got != batch $expected")
  }

  test("stream-static enrichment join equals the batch join") {
    import spark.implicits._
    // The dimension-enrichment shape: each micro-batch joins the stream
    // against a STATIC dim table — no state, no watermark needed; the dim
    // broadcasts per batch (at scale: the same broadcast-small-dims rule as
    // the batch star join).
    val tmp = Files.createTempDirectory("graft-ssenrich").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/a.jsonl"),
      (0 until 30).map(i => s"""{"user_id": ${i % 5}, "event_id": $i}""").mkString("\n"))
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("user_id", "tier")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType)))
    val q = spark.readStream.schema(schema).json(s"$tmp/in")
      .join(dim, Seq("user_id")) // inner: unknown users drop
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("enriched").select("user_id", "event_id", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = spark.read.schema(schema).json(s"$tmp/in")
      .join(dim, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected && got.size == 18, s"stream-static $got != batch $expected")
  }

  test("stream-stream interval join with watermarks equals the batch join") {
    // The attribution shape: clicks join impressions on user within
    // [imp_ts, imp_ts + 10 min]. Both sides watermarked so the join state
    // is BOUNDED — Spark evicts an impression once the click watermark
    // passes imp_ts + 10 min (without the time bound + watermarks the state
    // grows without limit, the stream-stream scale failure mode).
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/imp"))
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/clk"))
    val imps = (0 until 20).map { i =>
      f"""{"user_id": ${i % 4}, "imp_id": $i, "imp_ts": "2024-01-01T00:${i % 30}%02d:00.000Z"}"""
    }
    val clks = (0 until 15).map { i =>
      f"""{"user_id": ${i % 4}, "clk_id": $i, "clk_ts": "2024-01-01T00:${(i * 2) % 45}%02d:30.000Z"}"""
    }
    Files.writeString(java.nio.file.Paths.get(s"$tmp/imp/a.jsonl"), imps.mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/clk/a.jsonl"), clks.mkString("\n"))

    val impSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("imp_id", LongType), StructField("imp_ts", TimestampType)))
    val clkSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("clk_id", LongType), StructField("clk_ts", TimestampType)))
    def joined(imp: org.apache.spark.sql.DataFrame, clk: org.apache.spark.sql.DataFrame) =
      imp.withWatermark("imp_ts", "10 minutes")
        .join(clk.withWatermark("clk_ts", "10 minutes"),
          imp("user_id") === clk("user_id") &&
            col("clk_ts") >= col("imp_ts") &&
            col("clk_ts") <= col("imp_ts") + expr("interval 10 minutes"))
        .select(imp("user_id"), col("imp_id"), col("clk_id"))

    val q = joined(
      spark.readStream.schema(impSchema).json(s"$tmp/imp"),
      spark.readStream.schema(clkSchema).json(s"$tmp/clk"))
      .writeStream.format("memory").queryName("attrib").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val got = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = joined(
      spark.read.schema(impSchema).json(s"$tmp/imp"),
      spark.read.schema(clkSchema).json(s"$tmp/clk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty,
      s"stream-stream join ${got.size} rows != batch ${expected.size}")
  }

  test("stream-stream LEFT OUTER interval join: unmatched rows flush as nulls on watermark") {
    // Outer stream-stream is the attribution report's honest form: an
    // impression with NO click inside the window must still appear (null
    // click) — but only once the click watermark guarantees no match can
    // still arrive. The null rows therefore emit in the no-data batch that
    // advances the watermark past imp_ts + 10 min (a query that stopped at
    // the last data batch would hold them in state forever).
    val tmp = Files.createTempDirectory("graft-ssouter").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/imp"))
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/clk"))
    // imp 0 (user 0, 00:00) matched by clk 0 @00:05; imp 1 (user 1, 00:01)
    // unmatched; imp 2 (user 2, 00:02) "matched" only by a click OUTSIDE
    // the 10-min window -> also null. The GLOBAL watermark is the MIN over
    // both streams' watermarks, and expired state is cleaned one batch
    // after the watermark passes it — so BOTH sources get late "pusher"
    // rows in two follow-up batches (maxFilesPerTrigger=1): batch 1 loads
    // the payload, batch 2's pushers advance both watermarks past
    // imp_ts + 10 min, batch 3's pushers trigger the cleanup that flushes
    // the unmatched imps. Pusher rows (id >= 90) stay in state at stop;
    // the comparison scopes to the payload ids.
    Files.writeString(java.nio.file.Paths.get(s"$tmp/imp/a.jsonl"), Seq(
      """{"user_id": 0, "imp_id": 0, "imp_ts": "2024-01-01T00:00:00.000Z"}""",
      """{"user_id": 1, "imp_id": 1, "imp_ts": "2024-01-01T00:01:00.000Z"}""",
      """{"user_id": 2, "imp_id": 2, "imp_ts": "2024-01-01T00:02:00.000Z"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/clk/a.jsonl"), Seq(
      """{"user_id": 0, "clk_id": 0, "clk_ts": "2024-01-01T00:05:00.000Z"}""",
      """{"user_id": 2, "clk_id": 5, "clk_ts": "2024-01-01T00:30:00.000Z"}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/imp/b.jsonl"),
      """{"user_id": 90, "imp_id": 90, "imp_ts": "2024-01-01T01:30:00.000Z"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/clk/b.jsonl"),
      """{"user_id": 91, "clk_id": 91, "clk_ts": "2024-01-01T01:30:00.000Z"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/imp/c.jsonl"),
      """{"user_id": 92, "imp_id": 92, "imp_ts": "2024-01-01T02:30:00.000Z"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/clk/c.jsonl"),
      """{"user_id": 93, "clk_id": 93, "clk_ts": "2024-01-01T02:30:00.000Z"}""")
    for (src <- Seq("imp", "clk"); (f, i) <- Seq("a", "b", "c").zipWithIndex)
      Files.setLastModifiedTime(java.nio.file.Paths.get(s"$tmp/$src/$f.jsonl"),
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
    val impSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("imp_id", LongType), StructField("imp_ts", TimestampType)))
    val clkSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("clk_id", LongType), StructField("clk_ts", TimestampType)))
    def joined(imp: org.apache.spark.sql.DataFrame, clk: org.apache.spark.sql.DataFrame) =
      imp.withWatermark("imp_ts", "10 minutes")
        .join(clk.withWatermark("clk_ts", "10 minutes"),
          imp("user_id") === clk("user_id") &&
            col("clk_ts") >= col("imp_ts") &&
            col("clk_ts") <= col("imp_ts") + expr("interval 10 minutes"),
          "left_outer")
        .select(imp("user_id"), col("imp_id"), col("clk_id"))
    val q = joined(
      spark.readStream.schema(impSchema).option("maxFilesPerTrigger", 1).json(s"$tmp/imp"),
      spark.readStream.schema(clkSchema).option("maxFilesPerTrigger", 1).json(s"$tmp/clk"))
      .writeStream.format("memory").queryName("attrib_outer").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val got = spark.table("attrib_outer").collect().map(key).filter(_._2 <= 2).toSet
    val expected = joined(
      spark.read.schema(impSchema).json(s"$tmp/imp"),
      spark.read.schema(clkSchema).json(s"$tmp/clk")).collect().map(key).filter(_._2 <= 2).toSet
    assert(got == expected, s"stream $got != batch $expected")
    assert(got == Set((0L, 0L, 0L), (1L, 1L, -1L), (2L, 2L, -1L)),
      "unmatched and out-of-window impressions must surface with null clicks")
  }

  test("gzip JSONL sink round-trip (K3)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-gz").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    graft.sources.Sinks.jsonl(df, s"$tmp/out", compression = Some("gzip"))
    val files = new java.io.File(s"$tmp/out").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    assert(spark.read.json(s"$tmp/out").count() == 2)
  }
}
