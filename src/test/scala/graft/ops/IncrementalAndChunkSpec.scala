package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan pins for incremental (delta-vs-base) exact dedup and
  * context-window chunking: classification against the base fingerprint
  * store, within-delta keep-first, the one-shuffle delta plan (the window's
  * hash partitioning on fp is REUSED by the join), sliding-window coverage
  * and overlap, and the no-shuffle chunking plan.
  */
class IncrementalAndChunkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("incremental dedup classifies dup_base / new / dup_delta with the right keepers") {
    import spark.implicits._
    val docs = Seq(
      (1L, "base", "hello world"),
      (2L, "base", "foo bar"),
      (10L, "delta", "hello world"),   // already in base -> dup_base, keeper 1
      (11L, "delta", "new stuff"),     // first of its fp in delta -> new
      (12L, "delta", "new stuff"),     // later copy within delta -> dup_delta, keeper 11
      (13L, "delta", "  Hello   WORLD ") // normalization folds into base fp
    ).toDF("doc_id", "source", "text")
    val out = DedupQueries.dedupIncrementalFrom(docs, baseSource = "base")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (10L, "dup_base", 1L),
      (11L, "new", 11L),
      (12L, "dup_delta", 11L),
      (13L, "dup_base", 1L)))
  }

  test("incremental dedup shuffles the delta once: window partitioning reused by the join") {
    // with broadcast off, the fp-join would need its own Exchange on the
    // delta side UNLESS the window's hashpartitioning(fp) carries through —
    // so exactly one Exchange per side, two total
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = DedupQueries.dedupIncremental(spark, dir)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning(fp"))
      assert(exchanges == 2,
        s"expected 2 fp exchanges (one per side), saw $exchanges:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("chunking covers every token, overlaps by chunkTokens - stride, never pads") {
    import spark.implicits._
    val words = (1 to 95).map(i => s"w$i")
    val docs = Seq((5L, words.mkString(" "))).toDF("doc_id", "text")
    val out = CurationQueries.docChunkFrom(docs, chunkTokens = 50, stride = 40)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(1), r.getString(2).split(" ").toSeq, r.getInt(3)))
    assert(out.length == 3) // ceil(95 / 40)
    assert(out(0)._2 == words.slice(0, 50) && out(0)._3 == 50)
    assert(out(1)._2 == words.slice(40, 90) && out(1)._3 == 50)
    assert(out(2)._2 == words.slice(80, 95) && out(2)._3 == 15) // short tail kept as-is
    // overlap: the last 10 tokens of chunk k are the first 10 of chunk k+1
    assert(out(0)._2.takeRight(10) == out(1)._2.take(10))
    // coverage: the union of chunks is exactly the document
    assert(out.flatMap(_._2).toSet == words.toSet)
  }

  test("chunking is a pure generator: no shuffle exchange in the plan") {
    val plan = CurationQueries.docChunk(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking should not shuffle:\n$plan")
  }

  test("chunking rejects a stride wider than the chunk (silent token drops)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CurationQueries.docChunkFrom(docs, chunkTokens = 10, stride = 20)
    }
  }
}
