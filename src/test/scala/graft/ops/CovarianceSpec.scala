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
    val (pca, rowsM) = SimilarityQueries.embPcaPowerFrom(emb)
    try {
      val rows = pca.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val (l1, eig) = rows(1)
      assert(math.abs(math.abs(l1) - 1.0) < 1e-9, s"loading on dim 1 was $l1")
      rows.filter(_._1 != 1).foreach { case (i, (l, _)) =>
        assert(math.abs(l) < 1e-9, s"dim $i leaked loading $l")
      }
      assert(math.abs(eig - 1.0) < 1e-9, s"eigenvalue was $eig, expected var=1")
    } finally rowsM.unpersist()
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
