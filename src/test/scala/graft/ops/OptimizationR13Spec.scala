package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the round-13 optimization changes: the codegen'd n-gram
  * expressions replace interpreted HOF chains + shuffle arms, and each is
  * held to bit-equivalence with the formulation it replaced on adversarial
  * fixtures (repeats, count ties, short docs, null elements, empty arrays).
  */
class OptimizationR13Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Adversarial token arrays: heavy repetition (dup mass + count ties),
    * tie-on-count grams (gram-asc tiebreak), short docs (< n tokens), a
    * null element (array_join skip-null semantics), multi-char tokens, and
    * an empty array.
    */
  private val fixtures =
    """VALUES
      |  (1, array('a','b','a','b','a','b','c')),
      |  (2, array('x','x','x','x')),
      |  (3, array('one')),
      |  (4, array('t', CAST(NULL AS STRING), 't', 'u', 't')),
      |  (5, array('zz','aa','zz','aa','bb','aa','zz')),
      |  (6, CAST(array() AS ARRAY<STRING>)),
      |  (7, array('p','q')),
      |  (8, array('m','n','m','n','m','n','m','n','m','n','m','n'))
      |AS t(doc_id, t)""".stripMargin

  test("graft_ngrams matches transform(sequence, slice, array_join) on adversarial fixtures") {
    for (n <- Seq(1, 2, 3, 4, 10)) {
      val rows = spark.sql(
        s"""SELECT doc_id, graft_ngrams(t, $n) AS fast,
           |  CASE WHEN size(t) < $n THEN CAST(array() AS ARRAY<STRING>)
           |       ELSE transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))
           |  END AS slow
           |FROM $fixtures""".stripMargin).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n doc=${r.get(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
    assert(spark.sql("SELECT graft_ngrams(CAST(NULL AS ARRAY<STRING>), 2) IS NULL")
      .collect().head.getBoolean(0))
  }

  test("graft_gram_mass matches the exploded groupBy/window formulation") {
    for (n <- Seq(2, 3, 4, 5, 10)) {
      // the OLD formulation, verbatim: explode grams, count per (doc, gram),
      // top by (cnt DESC, g ASC), dup = sum of cnt*length(g) where cnt >= 2
      val slow = spark.sql(
        s"""WITH cnts AS (
           |  SELECT doc_id, g, count(1) AS cnt FROM (
           |    SELECT doc_id,
           |      explode(transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))) AS g
           |    FROM $fixtures WHERE size(t) >= $n)
           |  GROUP BY doc_id, g),
           |top AS (
           |  SELECT doc_id, CAST(cnt * length(g) AS BIGINT) AS top_chars FROM (
           |    SELECT doc_id, g, cnt,
           |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rk
           |    FROM cnts) WHERE rk = 1),
           |dup AS (
           |  SELECT doc_id, CAST(sum(IF(cnt >= 2, cnt * length(g), 0)) AS BIGINT) AS dup_chars
           |  FROM cnts GROUP BY doc_id)
           |SELECT top.doc_id, top.top_chars, dup.dup_chars
           |FROM top JOIN dup ON top.doc_id = dup.doc_id""".stripMargin)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val fast = spark.sql(
        s"SELECT doc_id, graft_gram_mass(t, $n) AS m FROM $fixtures").collect()
      fast.foreach { r =>
        val doc = r.getInt(0)
        val m = r.getStruct(1)
        val expected = slow.getOrElse(doc, (0L, 0L)) // absent = short doc -> (0, 0)
        assert((m.getLong(0), m.getLong(1)) == expected,
          s"n=$n doc=$doc: (${m.getLong(0)}, ${m.getLong(1)}) vs $expected")
      }
    }
    assert(spark.sql("SELECT graft_gram_mass(CAST(NULL AS ARRAY<STRING>), 2) IS NULL")
      .collect().head.getBoolean(0))
  }

  test("graft_winnow_fps matches the hash60/array_min window chain") {
    for ((k, w) <- Seq((3, 4), (2, 2), (1, 3), (3, 1))) {
      val slow = spark.sql(
        s"""SELECT doc_id, fp, count(1) AS n_windows FROM (
           |  SELECT doc_id,
           |    explode(transform(sequence(1, size(hs) - ${w - 1}), i -> array_min(slice(hs, i, $w)))) AS fp
           |  FROM (
           |    SELECT doc_id,
           |      transform(sequence(1, size(t) - ${k - 1}), i -> hash60(array_join(slice(t, i, $k), ' '))) AS hs
           |    FROM $fixtures WHERE size(t) >= ${k + w - 1}))
           |GROUP BY doc_id, fp""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val fast = spark.sql(
        s"""SELECT doc_id, s.fp, s.n_windows
           |FROM (SELECT doc_id, explode(graft_winnow_fps(t, $k, $w)) AS s FROM $fixtures)""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fast == slow, s"k=$k w=$w:\nfast=$fast\nslow=$slow")
    }
    // the array is fp-sorted (deterministic row set before the explode)
    val arr = spark.sql(
      "SELECT graft_winnow_fps(array('a','b','c','a','b','c','a','b'), 3, 4) AS a")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(_.getLong(0)) == arr.map(_.getLong(0)).sorted)
  }

  test("gopherRepetition's gram masses stay shuffle-free (no Exchange in the plan)") {
    val df = TextQueries.queries("text_gopher_repetition")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"gopher repetition regained a shuffle:\n$plan")
  }
}
