package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RelationalQueries, Tables}

/** Streaming transition extraction: one string of state per key must
  * reproduce the batch lead-window pair multiset — on static input exactly,
  * and across ordered micro-batches by carrying the last event type.
  */
class StreamingTransitionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def countPairs(ts: Seq[(String, String)]): Map[(String, String), Int] =
    ts.groupBy(identity).view.mapValues(_.size).toMap

  test("static-mode streaming transitions equal the batch q_transition_matrix counts") {
    // seq = the same (ts, event_id) total order the batch query uses,
    // densified to one long via row_number
    val ev = Tables(spark, dir, "events").selectExpr(
      "user_id AS key",
      "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS LONG) AS seq",
      "event_type AS etype")
    val streaming = countPairs(StreamingTransitions.transitions(ev).collect()
      .map(t => (t.from, t.to)).toSeq)
    val batch = RelationalQueries.transitionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    assert(streaming == batch,
      s"pair multisets diverge: streaming ${streaming.size} keys vs batch ${batch.size}")
  }

  test("state carries across micro-batches: cross-batch pairs emitted exactly once") {
    val tmp = Files.createTempDirectory("graft-strans").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // batch0 = [a,b], batch1 = [b,c]: (a,b) in-batch, (b,b) CROSS-batch
    // against carried state, (b,c) in-batch
    val batches = Seq(
      Seq("""{"key": 1, "seq": 1, "etype": "a"}""",
        """{"key": 1, "seq": 2, "etype": "b"}"""),
      Seq("""{"key": 1, "seq": 3, "etype": "b"}""",
        """{"key": 1, "seq": 4, "etype": "c"}"""))
    batches.zipWithIndex.foreach { case (lines, b) =>
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("seq", LongType), StructField("etype", StringType)))
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = StreamingTransitions.transitions(in.toDF()).writeStream
      .format("memory").queryName("strans").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("strans").collect()
      .map(r => (r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(("a", "b"), ("b", "b"), ("b", "c")),
      s"expected the cross-batch (b,b) pair exactly once: $got")
  }

  test("self-sequencing kernel equals the batch matrix with NO upstream ordering") {
    // raw (key, tsm, eid, etype) rows, deliberately shuffled: the kernel
    // must order the batch by (tsm, eid) itself
    val ev = Tables(spark, dir, "events").selectExpr(
        "user_id AS key", "unix_micros(ts) AS tsm",
        "event_id AS eid", "event_type AS etype")
      .orderBy(org.apache.spark.sql.functions.expr("hash(eid)"))
    val streaming = countPairs(StreamingTransitions.transitionsOrdered(ev).collect()
      .map(t => (t.from, t.to)).toSeq)
    val batch = RelationalQueries.transitionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    assert(streaming == batch,
      s"pair multisets diverge: streaming ${streaming.size} keys vs batch ${batch.size}")
  }

  test("self-sequencing kernel stitches across batches and sorts within each") {
    val tmp = Files.createTempDirectory("graft-strans2").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // within-batch rows arrive OUT of (tsm, eid) order — the kernel sorts;
    // across batches the carried (tsm, eid, etype) state stitches (b, b)
    val batches = Seq(
      Seq("""{"key": 1, "tsm": 20, "eid": 1, "etype": "b"}""",
        """{"key": 1, "tsm": 10, "eid": 1, "etype": "a"}"""),
      Seq("""{"key": 1, "tsm": 40, "eid": 1, "etype": "c"}""",
        """{"key": 1, "tsm": 30, "eid": 1, "etype": "b"}"""))
    batches.zipWithIndex.foreach { case (lines, b) =>
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("tsm", LongType), StructField("eid", LongType),
      StructField("etype", StringType)))
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = StreamingTransitions.transitionsOrdered(in.toDF()).writeStream
      .format("memory").queryName("strans2").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("strans2").collect()
      .map(r => (r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(("a", "b"), ("b", "b"), ("b", "c")),
      s"expected in-batch sort + cross-batch stitch: $got")
  }

  test("property: self-sequencing kernel equals the in-memory lead fold on 30 random event sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    (1 to 30).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(6)
      val events = (1 to 40 + rnd.nextInt(160)).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(30).toLong, i.toLong,
          s"e${rnd.nextInt(5)}")
      }
      val df = rnd.shuffle(events).toDF("key", "tsm", "eid", "etype")
      val got = StreamingTransitions.transitionsOrdered(df).collect()
        .map(t => (t.key, t.from, t.to)).groupBy(identity).view.mapValues(_.size).toMap
      val want = events.groupBy(_._1).toSeq.flatMap { case (k, evs) =>
        evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (k, a, b)
        }
      }.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want,
        s"trial $trial: pair multisets diverge (${got.size} vs ${want.size} keys)")
    }
  }
}
