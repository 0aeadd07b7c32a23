package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the segment-level (paragraph) dedup pass and the
  * bigram LM scorer: keep-first-occurrence across AND within documents,
  * in-order reassembly, fully-duplicated docs vanishing, and the
  * one-shuffle window formulation of lm_score matching the two-shuffle
  * groupBy + join-back it replaces.
  */
class ParagraphAndLmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("paragraph dedup keeps first occurrence, reassembles in order, drops fully-duplicated docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h i j k l"), // 4 segments at segWords=3, all novel
      (1L, "d e f x y z"),             // "d e f" already in doc 0 -> dropped
      (2L, "a b c d e f")              // every segment seen earlier -> doc vanishes
    ).toDF("doc_id", "text")
    val out = DedupQueries.dedupParagraphFrom(docs, segWords = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, 4L, "a b c d e f g h i j k l"),
      (1L, 1L, "x y z")))
  }

  test("paragraph dedup drops repeats WITHIN a document too (keep-first by seg_idx)") {
    import spark.implicits._
    val docs = Seq((7L, "p q r p q r")).toDF("doc_id", "text")
    val out = DedupQueries.dedupParagraphFrom(docs, segWords = 3).collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getString(2)) == (7L, 1L, "p q r"))
  }

  test("paragraph dedup: a trailing short segment is its own unit, not padded") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "d")).toDF("doc_id", "text")
    // doc 1 -> segs "a b c", "d"; doc 2's lone "d" duplicates doc 1's tail
    val out = DedupQueries.dedupParagraphFrom(docs, segWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 2L, "a b c d")))
  }

  test("lm_score groupBy + join-back formulation equals the window-count anchor") {
    val fast = TextQueries.lmScore(spark, dir)
    val anchor = TextQueries.lmScoreWindowed(spark, dir)
    val a = fast.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val b = anchor.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(a == b, s"missing=${b -- a}, extra=${a -- b}")
  }

  test("lm_score broadcasts the vocabulary-sized count table; the corpus bigrams never shuffle on bg") {
    val (out, tks) = TextQueries.lmScorePlan(spark, dir)
    try {
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("BroadcastHashJoin"), s"count table not broadcast:\n$plan")
      // exactly one Exchange on bg — the partial-aggregated counts side; the
      // occurrence-level grams must reach the join unshuffled
      val bgExchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning(bg"))
      assert(bgExchanges <= 1, s"grams shuffled on bg:\n$plan")
      // the tokenize barrier must hold: the gram lambda reads a materialized
      // attribute, never an inlined re-split of the raw text
      assert(!plan.contains("element_at(split("), s"split inlined into the gram lambda:\n$plan")
    } finally tks.unpersist()
  }
}
