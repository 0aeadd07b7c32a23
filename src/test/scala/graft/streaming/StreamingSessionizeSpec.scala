package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tables

/** Streaming sessionization: the merging session_window aggregation must
  * reproduce the lag-derivation's sessions exactly (under the shared
  * `diff >= gap` boundary convention), and micro-batch chopping must not
  * change the session set — an event arriving in a later batch extends or
  * merges the state-store session it overlaps.
  */
class StreamingSessionizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The batch twin: lag-based session ids with the `> gap` boundary
    * (session_window merges an exact-gap event — verified by the
    * boundary case below — which is q_sessionize's convention too),
    * materialized as (user, start, end = last + gap, n) rows.
    */
  private def lagTwin(events: org.apache.spark.sql.DataFrame, gapSeconds: Long) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"),
        (max(col("ts")) + expr(s"INTERVAL '$gapSeconds' SECOND")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
  }

  test("static session_window equals the lag derivation on the real events table") {
    val events = Tables(spark, dir, "events")
    val got = StreamingSessionize.sessions(events).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val want = lagTwin(events, 1800L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got.nonEmpty, "no sessions produced")
    assert(got == want,
      s"session sets differ: only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
  }

  test("micro-batch chopping is invariant: chopped stream equals the one-shot static run") {
    val tmp = Files.createTempDirectory("graft-sess").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // user 1: batch 0 has events at :00 and :10; batch 1 adds :12 (extends
    // the open session) and :50 (opens a new one — gap 20 min). user 2: one
    // event per batch exactly gap apart (boundary => MERGED: session_window
    // treats its half-open [t, t+gap) windows as adjacent-touching and
    // merges them, i.e. only diff > gap starts a new session).
    val b0 = Seq(
      """{"user_id": 1, "event_id": 1, "ts": "2024-01-01T10:00:00.000Z"}""",
      """{"user_id": 1, "event_id": 2, "ts": "2024-01-01T10:10:00.000Z"}""",
      """{"user_id": 2, "event_id": 3, "ts": "2024-01-01T09:00:00.000Z"}""")
    val b1 = Seq(
      """{"user_id": 1, "event_id": 4, "ts": "2024-01-01T10:12:00.000Z"}""",
      """{"user_id": 1, "event_id": 5, "ts": "2024-01-01T10:50:00.000Z"}""",
      """{"user_id": 2, "event_id": 6, "ts": "2024-01-01T09:20:00.000Z"}""")
    Seq(b0, b1).zipWithIndex.foreach { case (lines, b) =>
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = StreamingSessionize.sessions(in.toDF(), gapSeconds = 1200L).writeStream
      .format("memory").queryName("sess").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val static = StreamingSessionize.sessions(
        spark.read.schema(schema).json(s"$tmp/in"), gapSeconds = 1200L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == static,
      s"chopping changed the sessions: stream=$streamed static=$static")
    // the constructed expectations: user 1 -> 3-event session + 1-event
    // session; user 2 -> ONE 2-event session (exact-gap boundary merges)
    val byUser = streamed.groupBy(_._1).view.mapValues(_.map(_._4).toList.sorted).toMap
    assert(byUser(1L) == List(1L, 3L), s"user 1 sessions: ${byUser(1L)}")
    assert(byUser(2L) == List(2L), s"user 2 sessions: ${byUser(2L)}")
  }
}
