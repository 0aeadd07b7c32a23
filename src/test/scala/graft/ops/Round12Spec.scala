package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins: the WAV codec round trip, delete-aware IVF maintenance,
  * the production LSH dial's planted-pair recovery, batch-count-invariant
  * streaming state, and the bench flight recorder.
  */
class Round12Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-r12-ckpt").toString)
    s
  }

  override def afterAll(): Unit = spark.stop()

  // --- WAV codec round trip ---------------------------------------------

  test("WAV encode->decode is byte-lossless for every 8-bit value, odd lengths included") {
    import org.apache.spark.sql.types._
    // all 256 byte values plus a 37-byte odd-length track (RIFF chunks pad
    // odd data sizes with a trailing byte — the decode must not surface it)
    val tracks = Seq(
      Row(1L, (0 until 256).map(_.toByte).toArray),
      Row(2L, Array.tabulate(37)(i => (i * 7 % 256).toByte)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(tracks, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("pcm", BinaryType))))
    val out = MultimodalQueries.decodeWavs(MultimodalQueries.encodeWavs(df))
      .collect().map(r => r.getLong(0) -> r).toMap
    tracks.foreach { t =>
      val id = t.getLong(0)
      val pcm = t.getAs[Array[Byte]](1)
      val r = out(id)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 8,
        s"doc $id: decoder must report 8 kHz mono 8-bit, got $r")
      assert(r.getInt(4) == pcm.length, s"doc $id: frame count")
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](7), pcm),
        s"doc $id: decoded PCM must be byte-identical")
      assert(r.getLong(5) == pcm.map(_ & 0xff).map(_.toLong).sum, s"doc $id: sum_amp")
      assert(r.getLong(6) == pcm.map(b => { val v = (b & 0xff).toLong; v * v }).sum,
        s"doc $id: sum_sq")
    }
  }

  // --- delete-aware IVF maintenance ---------------------------------------

  /** The delete stream re-derived from public surfaces: SemDeDup's pruned
    * ids + the policy stratum — must match what the maintenance entries
    * removed.
    */
  private def deletedIds(): Set[Long] = {
    val pruned = SimilarityQueries.embSemanticDedup(spark, dir)
      .filter(!col("kept")).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val policy = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % SimilarityQueries.DeletePolicyMod === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    pruned ++ policy
  }

  test("ann_ivf_delete returns no deleted vector as neighbor or query") {
    val del = deletedIds()
    assert(del.nonEmpty && del.contains(3L),
      s"the delete stream must be non-trivial and include query vector 3, got ${del.size} ids")
    val rows = SimilarityQueries.annIvfDelete(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!del.contains(r.getLong(0)), s"deleted query ${r.getLong(0)} still searches")
      assert(!del.contains(r.getLong(2)), s"deleted vector ${r.getLong(2)} still a neighbor")
    }
  }

  test("ann_ivf_delete_recall reports exactly the surviving queries, recall in [0,1]") {
    val del = deletedIds()
    val expected = (0L until 10L).filterNot(del).toSet
    val rows = SimilarityQueries.annIvfDeleteRecall(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == expected,
      s"surviving-query set mismatch: got ${rows.map(_.getLong(0)).toSeq.sorted}")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(1) == math.round(r.getDouble(2) * 5))
      assert(r.getLong(3) == math.round(r.getDouble(4) * 5))
    }
  }

  // --- production LSH dial -------------------------------------------------

  test("dedup_embedding_lsh_prod recovers >= 90% of the planted near-copies") {
    val planted = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0).count()
    val out = DedupQueries.dedupEmbeddingLshProd(spark, dir).collect()
    val plantedFound = out.count(r =>
      r.getLong(1) == r.getLong(0) + DedupQueries.ProdPlantOffset)
    assert(plantedFound >= math.ceil(planted * 0.9),
      s"found $plantedFound of $planted planted pairs at the 4x12/0.9 dial")
  }

  // --- streaming state is batch-count-invariant ----------------------------

  test("minhash kernel state rows are identical for 2 vs 6 micro-batch splits") {
    import org.apache.spark.sql.expressions.Window
    // deterministic subset (limit() picks arbitrary rows and the two
    // stateAt() calls must stage the SAME corpus)
    val docs = Tables(spark, dir, "documents")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    def stateAt(n: Int): Long = {
      val fileOf = ntile(n).over(Window.orderBy(col("doc_id"))) - 1
      val (batches, stateRows, _, _) =
        graft.streaming.StreamingGate.stateGrowthProbe(docs, fileOf, n) {
          st => graft.streaming.StreamingDedup.minhashCandidates(st).toDF()
        }
      assert(batches >= n, s"expected >= $n data batches, got $batches")
      stateRows
    }
    val (s2, s6) = (stateAt(2), stateAt(6))
    assert(s2 > 0 && s2 == s6,
      s"state must be corpus-bound, not batch-bound: $s2 rows at N=2 vs $s6 at N=6")
  }

  // --- bench flight recorder ------------------------------------------------

  test("flight recorder accumulates task metrics and resets clean") {
    val rec = new graft.BenchFlightRecorder
    spark.sparkContext.addSparkListener(rec)
    try {
      rec.reset()
      spark.range(1000000).selectExpr("sum(id * id)").collect()
      // the listener bus is async: poll until the task-end events land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var snap = rec.snapshot()
      while (snap(7) == 0 && System.nanoTime() < deadline) {
        Thread.sleep(50); snap = rec.snapshot()
      }
      assert(snap(7) > 0, s"expected task-end events, got $snap")
      assert(snap(0) >= 0 && snap(1) >= 0, "run/cpu time aggregates present")
      rec.reset()
      assert(rec.snapshot().forall(_ == 0L), "reset must zero every counter")
    } finally spark.sparkContext.removeSparkListener(rec)
  }
}
