package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries streaming heavy hitters: the bounded-state guarantees. */
class StreamingSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("exact when distinct tokens fit the counters; estimates never exceed truth") {
    import spark.implicits._
    // one shard so the bound is easy to reason about; 5 distinct <= k=16
    val items = (Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(9)("gamma") ++
      Seq.fill(2)("delta") ++ Seq.fill(1)("eps")).toDF("item")
    val out = StreamingSketch.heavyHitters(items, shards = 1, k = 16)
      .collect().map(t => t.token -> t.est).toMap
    assert(out == Map("alpha" -> 30L, "beta" -> 20L, "gamma" -> 9L,
      "delta" -> 2L, "eps" -> 1L), s"no decrement should fire: $out")
  }

  test("a heavy token survives an adversarial distinct tail; estimates lower-bound truth") {
    import spark.implicits._
    // 120 copies of 'hot' + 300 singletons through k=8 counters: true
    // count 120 > N/(k+1) = 420/9 ~ 47, so 'hot' MUST be in the summary
    val items = (Seq.fill(120)("hot") ++ (1 to 300).map(i => s"tail$i")).toDF("item")
    val out = StreamingSketch.heavyHitters(items, shards = 1, k = 8)
      .collect().map(t => t.token -> t.est).toMap
    assert(out.contains("hot"), s"guaranteed heavy hitter missing: $out")
    assert(out("hot") <= 120L, "estimates must never exceed the true count")
    assert(out.size <= 8, "state must stay within k counters")
  }

  test("property: the full Misra-Gries guarantee holds on 50 randomized skewed streams") {
    import spark.implicits._
    // seeded PRNG: reproducible adversarial mixes of hot tokens + long
    // distinct tails, random (shards, k); per shard of size N with k
    // counters assert the THREE guarantees the gate row checks:
    //   est <= true, true - est <= N/(k+1), and every token with
    //   true > N/(k+1) survives in the summary
    val rnd = new scala.util.Random(41)
    (1 to 50).foreach { trial =>
      val shards = 1 + rnd.nextInt(4)
      val k = 2 + rnd.nextInt(14)
      val nHot = rnd.nextInt(4)
      val hot = (1 to nHot).flatMap(h => Seq.fill(50 + rnd.nextInt(200))(s"hot$h"))
      val tail = (1 to 100 + rnd.nextInt(400)).map(i => s"t${rnd.nextInt(300)}")
      val items = rnd.shuffle(hot ++ tail)
      val out = StreamingSketch.heavyHitters(items.toDF("item"), shards, k)
        .collect().map(t => (t.shard, t.token) -> t.est).toMap
      // re-derive shard + truth exactly as the kernel does
      val shardOf = items.distinct.map { it =>
        it -> graft.functions.Hash60Impl.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(it)) % shards
      }.toMap.map { case (t, s) => t -> s.toInt }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nShard = items.groupBy(shardOf).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (tok, n) =>
        val sh = shardOf(tok)
        val bound = nShard(sh).toDouble / (k + 1)
        out.get((sh, tok)) match {
          case Some(est) =>
            assert(est <= n, s"trial $trial: $tok overcounts ($est > $n)")
            assert(n - est <= bound,
              s"trial $trial: $tok undercount ${n - est} > bound $bound (N=${nShard(sh)}, k=$k)")
          case None =>
            assert(n <= bound,
              s"trial $trial: guaranteed token $tok (true $n > bound $bound) missing")
        }
      }
    }
  }

  test("counts accumulate across micro-batches; later batch re-emits the summary") {
    val tmp = Files.createTempDirectory("graft-ssketch").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b0.jsonl"),
      (Seq.fill(5)("""{"item": "w1"}""") ++ Seq.fill(2)("""{"item": "w2"}""")).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/in/b1.jsonl"),
      (Seq.fill(4)("""{"item": "w1"}""") ++ Seq.fill(7)("""{"item": "w3"}""")).mkString("\n"))
    val schema = StructType(Seq(StructField("item", StringType)))
    val q = StreamingSketch.heavyHitters(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(s"$tmp/in"),
      shards = 1, k = 16)
      .toDF()
      .writeStream.format("memory").queryName("ssketch").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the LATEST emission per token is the carried total
    val latest = spark.table("ssketch")
      .groupBy(col("token")).agg(max(col("est")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest == Map("w1" -> 9L, "w2" -> 2L, "w3" -> 7L),
      s"cross-batch accumulation broken: $latest")
  }
}
