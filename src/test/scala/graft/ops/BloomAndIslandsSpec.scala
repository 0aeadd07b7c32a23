package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape specs for the bloom-gated incremental dedup
  * (`dedup_bloom`), the gaps-and-islands interval merge
  * (`q_interval_merge`), and the lateral top-n decorrelation
  * (`q_lateral_topn`).
  *
  * The plan assertions are the scale contract:
  *   - dedup_bloom's confirm join must see only bloom-probable delta rows
  *     (the `might_contain` filter sits BELOW the join, directly over the
  *     scan), and bloom-rejected rows must flow join-free;
  *   - the lateral LIMIT must decorrelate into a WindowGroupLimit + window
  *     rewrite, never a per-outer-row nested loop.
  */
class BloomAndIslandsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // --- dedup_bloom ------------------------------------------------------

  test("dedup_bloom classification agrees with dedupIncremental on every delta doc") {
    val bloom = DedupQueries.dedupBloom(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val inc = DedupQueries.dedupIncremental(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bloom.keySet == inc.keySet, "both classify exactly the delta docs")
    bloom.foreach { case (id, st) =>
      val expected = if (inc(id) == "dup_base") "dup_base" else "new"
      assert(st == expected, s"doc $id: bloom=$st incremental=${inc(id)}")
    }
  }

  test("dedup_bloom plan: probe below the join; rejected rows flow join-free") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, Union}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val plan = DedupQueries.dedupBloom(spark, dir).queryExecution.optimizedPlan
    val union = plan.collectFirst { case u: Union => u }.getOrElse(fail("no Union"))
    val Seq(rejectBranch, confirmBranch) = union.children

    // branch 1 (bloom-rejected => 'new'): a NOT might_contain filter, no join at all
    assert(rejectBranch.collect { case j: Join => j }.isEmpty,
      "bloom-rejected rows must never enter a join")
    assert(rejectBranch.collect {
      case f: Filter if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.nonEmpty, "reject branch filters on the bloom probe")

    // branch 2: the join's delta side is pre-filtered by the probe
    val join = confirmBranch.collectFirst { case j: Join => j }.getOrElse(fail("no confirm join"))
    val deltaSide = join.left
    assert(deltaSide.collect {
      case f: Filter if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.nonEmpty, "confirm join input must be bloom-filtered below the join")
  }

  test("bloom probe admits every true duplicate (no false negatives) and prunes") {
    // the reject branch claims 'new' without consulting the base: any true
    // dup landing there would be a wrong answer. Cross-check against the
    // exact fingerprint sets.
    val fps = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "source",
        "md5(CAST(regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS BINARY)) AS fp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val baseFps = fps.filter(_._2 == "src0").map(_._3).toSet
    val delta = fps.filter(_._2 != "src0")
    val byStatus = DedupQueries.dedupBloom(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    delta.foreach { case (id, _, fp) =>
      assert((byStatus(id) == "dup_base") == baseFps.contains(fp),
        s"doc $id misclassified")
    }
  }

  // --- interval merge (gaps and islands) --------------------------------

  private def islands(rows: Seq[(Long, Long, Long, Long)]): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    RelationalQueries.intervalMergeFrom(
      rows.toDF("user_id", "event_id", "s0", "e0"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("interval merge: overlap and touch merge, strict gap splits, per-user isolation") {
    val out = islands(Seq(
      // user 1: [0,10] overlaps [5,20], [20,25] touches (20 == max end) => one island
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 25L),
      // user 1: [26,30] starts strictly after 25 => second island
      (1L, 4L, 26L, 30L),
      // user 2: same coordinates as user 1's island 2 — independent numbering
      (2L, 5L, 26L, 30L)))
    assert(out == Map(
      (1L, 1L) -> (0L, 25L, 3L),
      (1L, 2L) -> (26L, 30L, 1L),
      (2L, 1L) -> (26L, 30L, 1L)))
  }

  test("interval merge: containment and out-of-order ends") {
    // [0,100] contains everything after it: later intervals never extend the
    // running max, and a small interval [10,20] must not re-open an island
    val out = islands(Seq(
      (7L, 1L, 0L, 100L), (7L, 2L, 10L, 20L), (7L, 3L, 50L, 60L),
      (7L, 4L, 101L, 110L)))
    assert(out == Map(
      (7L, 1L) -> (0L, 100L, 3L),
      (7L, 2L) -> (101L, 110L, 1L)))
  }

  // --- aHash perceptual dedup -------------------------------------------

  test("ahash finds perceptual near-dups on constructed payloads and rejects distant ones") {
    import spark.implicits._
    // doc 1 and 2: same byte pattern with one sampled byte nudged => small
    // hamming; doc 3: alternating high/low bytes => far from both
    val base = Array.tabulate(120)(i => ((i * 37) % 251 + 1).toByte)
    val near = base.clone(); near(0) = ((base(0) + 120) % 251 + 1).toByte
    val far = Array.tabulate(120)(i => if (i % 2 == 0) 1.toByte else 250.toByte)
    val media = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "media")

    val sigs = MultimodalQueries.ahashSigsFrom(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 3,
      "one nudged byte flips at most its own bits")
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 3,
      "alternating payload must be far from the smooth one")

    val (pairs, barrier) = MultimodalQueries.ahashDedupFrom(media)
    try {
      val out = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((1L, 2L)), s"expected exactly the near pair, got $out")
    } finally barrier.unpersist()
  }

  test("codegen'd ahash60 is bit-identical to the portable SQL derivation") {
    graft.functions.GraftFunctions.registerAll(spark)
    val media = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS media")
    val hexChars = "'0123456789ABCDEF'"
    val sqlSigs = media
      .selectExpr("doc_id", "octet_length(media) AS n", "hex(media) AS hx")
      .selectExpr("doc_id",
        "graft_barrier(transform(sequence(0, 59), k -> " +
          s"(instr($hexChars, substring(hx, 2 * CAST(floor(k * n / 60) AS INT) + 1, 1)) - 1) * 16 + " +
          s"instr($hexChars, substring(hx, 2 * CAST(floor(k * n / 60) AS INT) + 2, 1)) - 1)) AS px")
      .selectExpr("doc_id", "px",
        "aggregate(px, CAST(0 AS BIGINT), (a, x) -> a + x) AS total")
      .selectExpr("doc_id",
        "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (a, k) -> " +
          "a + IF(60 * element_at(px, k + 1) > total, shiftleft(CAST(1 AS BIGINT), k), CAST(0 AS BIGINT))) AS sig")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exprSigs = MultimodalQueries.ahashSigsFrom(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exprSigs == sqlSigs, "expression and SQL signature paths diverged")
    assert(exprSigs.nonEmpty)
  }

  test("ahash identical payloads pair at hamming zero") {
    import spark.implicits._
    val b = "the same binary payload repeated enough to sample sixty pixels from it!"
      .getBytes("UTF-8")
    val media = Seq((10L, b), (11L, b)).toDF("doc_id", "media")
    val (pairs, barrier) = MultimodalQueries.ahashDedupFrom(media)
    try {
      val out = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.toSeq == Seq((10L, 11L, 0)))
    } finally barrier.unpersist()
  }

  // --- lateral top-n ----------------------------------------------------

  test("lateral LIMIT decorrelates to WindowGroupLimit (no nested loop)") {
    val qe = RelationalQueries.lateralTopN(spark, dir).queryExecution
    val plan = qe.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "correlated LIMIT should rewrite to a group-limit window")
    assert(!qe.sparkPlan.toString.contains("BroadcastNestedLoopJoin"),
      "lateral join must execute as an equi-join")
  }
}
