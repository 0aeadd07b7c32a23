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

  test("lm_score window formulation equals the groupBy + join-back formulation") {
    val fast = TextQueries.lmScore(spark, dir)
    // the naive two-shuffle reference: corpus bigram counts, joined back
    val toks = "split(trim(text), '\\\\s+')"
    val grams = Tables(spark, dir, "documents")
      .filter(expr(s"size($toks) >= 2"))
      .selectExpr("doc_id",
        s"explode(transform(sequence(1, size($toks) - 1), " +
          s"i -> concat(element_at($toks, i), ' ', element_at($toks, i + 1)))) AS bg")
    val counts = grams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val slow = grams.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("freq_sum"))
      .selectExpr("doc_id", "n_bigrams", "freq_sum",
        "CAST(freq_sum AS DOUBLE) / n_bigrams AS lm_score")
    val a = fast.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val b = slow.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(a == b, s"missing=${b -- a}, extra=${a -- b}")
  }

  test("lm_score shuffles the bigrams once: no join in the optimized plan") {
    val plan = TextQueries.lmScore(spark, dir).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join:\n$plan")
  }
}
