package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RelationalQueries, Tables}

/** Streaming EWMA: O(1)-state per-key smoothing must agree with the batch
  * `q_ewma` fold — on static input exactly, and across ordered micro-batches
  * by carrying the smoothed value as state.
  */
class StreamingMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("property: streaming Holt equals the in-memory dyadic fold on 30 random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    (1 to 30).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(5)
      val obs = (1 to 30 + rnd.nextInt(120)).map { i =>
        (rnd.nextInt(nKeys).toLong, i.toLong,
          math.floor(rnd.nextDouble() * 10000) / 100.0)
      }
      val df = rnd.shuffle(obs).toDF("key", "seq", "x")
      val got = StreamingMetrics.holt(df).collect()
        .map(h => h.key -> (h.level, h.trend, h.n)).toMap
      val want = obs.groupBy(_._1).map { case (k, os) =>
        var (l, t, n) = (0.0, 0.0, 0L)
        os.sortBy(o => (o._2, o._3)).foreach { o =>
          if (n == 0L) { l = o._3; t = 0.0 }
          else { val l2 = (o._3 + (l + t)) / 2; t = ((l2 - l) + t) / 2; l = l2 }
          n += 1
        }
        k -> (l, t, n)
      }
      assert(got == want, s"trial $trial: Holt states diverge")
    }
  }

  test("static-mode streaming EWMA equals the q_ewma batch fold per key") {
    val obs = Tables(spark, dir, "lineitem").selectExpr(
      "l_orderkey AS key", "l_linenumber AS seq", "l_quantity AS x")
    val streaming = StreamingMetrics.ewma(obs).collect()
      .map(s => s.key -> (s.ewma, s.n)).toMap
    val batch = RelationalQueries.ewma(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(1))).toMap
    assert(streaming.keySet == batch.keySet)
    streaming.foreach { case (k, (e, n)) =>
      assert(batch(k) == ((e, n)), s"key $k: streaming $e/$n vs batch ${batch(k)}")
    }
  }

  test("state carries across micro-batches: final emission equals the full-history fold") {
    val tmp = Files.createTempDirectory("graft-sewma").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // two ordered batches per key: seq 1-3 then seq 4-6
    (0 until 2).foreach { b =>
      val lines = for (k <- 1 to 3; i <- 1 to 3) yield {
        val seq = b * 3 + i
        s"""{"key": $k, "seq": $seq, "x": ${k * 10 + seq}.5}"""
      }
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("seq", LongType), StructField("x", DoubleType)))
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = StreamingMetrics.ewma(in.toDF()).writeStream
      .format("memory").queryName("sewma").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the memory sink accumulates one emission per key per touched batch;
    // the LAST emission per key (highest n) is the current state
    val last = spark.table("sewma").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    (1 to 3).foreach { k =>
      val expected = (1 to 6).map(i => k * 10 + i + 0.5)
        .foldLeft(0.0)((acc, x) => (acc + x) / 2)
      val (_, e, n) = last(k.toLong)
      assert(n == 6L, s"key $k folded $n observations")
      assert(e == expected, s"key $k: $e != $expected")
    }
  }

  test("streaming anomalies: spike flagged from pre-fold state, warm-up silent, cross-batch carry") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-sanom").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    // key 1: steady 10s for 5 obs (batch 0), then a 100 spike + recovery
    // (batch 1) — the spike must be flagged against the PRE-SPIKE state;
    // the warm-up obs (first 3) must not flag even with dev = 0
    val b0 = (1 to 5).map(i => s"""{"key": 1, "seq": $i, "x": 10.0}""")
    val b1 = Seq("""{"key": 1, "seq": 6, "x": 100.0}""",
      """{"key": 1, "seq": 7, "x": 10.0}""")
    Seq(b0, b1).zipWithIndex.foreach { case (lines, b) =>
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("seq", LongType), StructField("x", DoubleType)))
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = StreamingMetrics.anomalies(in.toDF()).writeStream
      .format("memory").queryName("sanom").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val flags = spark.table("sanom").collect()
      .map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    assert(flags == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> true, 7L -> false),
      s"expected exactly the seq-6 spike flagged (cross-batch state): $flags")
    // equivalence with the sequential fold on static input
    val ev = graft.ops.Tables(spark, dir, "events").selectExpr(
      "user_id AS key",
      "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS LONG) AS seq",
      "value AS x")
    val streaming = StreamingMetrics.anomalies(ev).collect()
      .map(a => (a.key, a.seq) -> (a.level, a.dev, a.anomaly)).toMap
    val ref = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).iterator.flatMap { case (k, rows) =>
        var (level, dev, n) = (0.0, 0.0, 0L)
        rows.sortBy(_._2).toSeq.map { case (_, seq, x) =>
          val flag = n >= 3 && math.abs(x - level) > 3.0 * dev
          val out = (k, seq) -> ((level, dev, flag))
          if (n == 0L) { level = x; dev = 0.0 }
          else { dev = (dev + math.abs(x - level)) / 2; level = (level + x) / 2 }
          n += 1
          out
        }
      }.toMap
    assert(streaming == ref, "static-mode anomalies diverge from the sequential fold")
  }
}
