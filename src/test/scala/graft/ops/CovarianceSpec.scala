package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan pins for `emb_covariance` (one-pass exact moment
  * accumulation) and `q_cumulative_distinct` (first-seen identity for
  * expanding distinct counts).
  */
class CovarianceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("covariance cells match hand-computed population covariance") {
    import spark.implicits._
    // vectors (1,2) and (3,4): var(dim1)=1, var(dim2)=1, cov(1,2)=1
    val emb = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("embedding")
    val out = SimilarityQueries.embCovarianceFrom(emb, dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set((1, 1), (1, 2), (2, 2)), "upper triangle only")
    assert(out((1, 1)) == (2L, 1.0))
    assert(out((1, 2)) == (2L, 1.0))
    assert(out((2, 2)) == (2L, 1.0))
  }

  test("covariance of a constant dimension is exactly zero") {
    import spark.implicits._
    val emb = Seq(Seq(0.5f, 1.0f), Seq(0.5f, 3.0f), Seq(0.5f, 5.0f)).toDF("embedding")
    val out = SimilarityQueries.embCovarianceFrom(emb, dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out((1, 1)) == 0.0, "constant dim has zero variance")
    assert(out((1, 2)) == 0.0, "constant dim has zero covariance with anything")
  }

  test("covariance plan: quantization runs once per row (barrier holds)") {
    val plan = SimilarityQueries.embCovariance(spark, dir)
      .queryExecution.optimizedPlan.toString
    val nFloor = plan.toLowerCase.sliding(6).count(_ == "floor(")
    assert(nFloor == 1,
      s"expected exactly one quantizing transform in the plan, found $nFloor")
  }

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // dim 1 swings ±1 (variance 1), every other dim is constant: the top
    // eigenvector must be ±e1 and the eigenvalue the dim-1 variance
    val emb = (1 to 40).map { r =>
      Array.tabulate(64)(d => if (d == 0) (if (r % 2 == 0) 1.0f else -1.0f) else 0.25f)
    }.map(v => Tuple1(v.toSeq)).toDF("embedding")
    val pca = SimilarityQueries.embPcaPowerFrom(emb)
    val rows = pca.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (l1, eig) = rows(1)
    assert(math.abs(math.abs(l1) - 1.0) < 1e-9, s"loading on dim 1 was $l1")
    rows.filter(_._1 != 1).foreach { case (i, (l, _)) =>
      assert(math.abs(l) < 1e-9, s"dim $i leaked loading $l")
    }
    assert(math.abs(eig - 1.0) < 1e-9, s"eigenvalue was $eig, expected var=1")
  }

  test("top-k deflation recovers planted orthogonal directions in order") {
    import spark.implicits._
    // dim 1 swings ±2 (variance 4), dim 2 swings ±1 on an independent phase
    // (variance 1), all other dims constant: deflation must yield ±e1 with
    // eigenvalue 4 first, then ±e2 with eigenvalue 1
    val emb = (0 until 40).map { r =>
      Array.tabulate(64) {
        case 0 => if (r % 2 == 0) 2.0f else -2.0f
        case 1 => if (r % 4 < 2) 1.0f else -1.0f
        case _ => 0.25f
      }
    }.map(v => Tuple1(v.toSeq)).toDF("embedding")
    val chain = SimilarityQueries.pcaChainFrom(emb, k = 2)
    val row = chain.collect().head
    val v1 = row.getSeq[Double](row.fieldIndex("v1"))
    val v2 = row.getSeq[Double](row.fieldIndex("v2"))
    val (ev1, ev2) = (row.getDouble(row.fieldIndex("ev1")), row.getDouble(row.fieldIndex("ev2")))
    assert(math.abs(ev1 - 4.0) < 1e-6, s"ev1 was $ev1, expected var=4")
    assert(math.abs(ev2 - 1.0) < 1e-6, s"ev2 was $ev2, expected var=1")
    assert(math.abs(math.abs(v1.head) - 1.0) < 1e-6, s"v1 not along dim 1: ${v1.head}")
    assert(math.abs(math.abs(v2(1)) - 1.0) < 1e-6, s"v2 not along dim 2: ${v2(1)}")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: dot=$dot")
  }

  test("pca chain is a single-job expression chain (no per-iteration jobs)") {
    import spark.implicits._
    val emb = (0 until 8).map(r => Tuple1(Array.tabulate(64)(d =>
      ((r * 7 + d) % 5).toFloat / 4).toSeq)).toDF("embedding")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    SimilarityQueries.embPcaPowerFrom(emb).collect()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // one action -> a handful of jobs (AQE stages), NOT 2 per iteration x 12
    assert(after - before <= 6,
      s"power iteration launched ${after - before} jobs — the chain should not job-storm")
  }

  test("cumulative distinct equals brute-force expanding distinct count") {
    val out = RelationalQueries.cumulativeDistinct(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Tables(spark, dir, "events")
      .selectExpr("user_id", "CAST(ts AS LONG) DIV 3600 AS hour").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (hour, newUsers, cumUsers) =>
      val expected = ev.filter(_._2 <= hour).map(_._1).distinct.length
      assert(cumUsers == expected, s"hour $hour: cum $cumUsers != $expected")
    }
    assert(out.map(_._2).sum == ev.map(_._1).distinct.length,
      "new_users sums to the total distinct population")
  }
}
