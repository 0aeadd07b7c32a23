package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The IVF index must stay a *useful* approximation: multi-probe search has
  * to recover >= 90% of the exact brute-force top-5 at sf0.01 (the corpus is
  * essentially unclustered random vectors — the hardest case for IVF; see
  * SimilarityQueries.IVF_PROBES).
  */
class AnnRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("IVF multi-probe recall@5 >= 0.9 vs brute force at sf0.01") {
    val rec = SimilarityQueries.annRecall(spark, "/root/testdata/sf0.01")
    val overall = rec.agg(avg(col("recall"))).head().getDouble(0)
    assert(overall >= 0.9, s"IVF recall@5 degraded to $overall")
  }

  test("parameterized IVF: a non-default (k, iters, probes) config runs and reports recall") {
    import SimilarityQueries.IvfConfig
    val cfg = IvfConfig(k = 4, iters = 1, probes = 2)
    val rec = SimilarityQueries.annRecall(spark, "/root/testdata/sf0.001", cfg).collect()
    assert(rec.length == 10, "one recall row per query vector")
    assert(rec.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // probing 2 of 4 buckets must find a nontrivial share of true neighbors
    assert(rec.map(_.getDouble(2)).sum / rec.length >= 0.4,
      s"alt-config recall collapsed: ${rec.map(_.getDouble(2)).mkString(",")}")
    // the probe dial is monotone in expectation: probing ALL buckets is exact
    val exhaustive = SimilarityQueries
      .annRecall(spark, "/root/testdata/sf0.001", IvfConfig(k = 4, iters = 1, probes = 4))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(exhaustive == 1.0, s"probing every bucket must be exact, got $exhaustive")
  }

  test("parameterized PQ: non-default subspace/codebook configs run deterministically") {
    import SimilarityQueries.PqConfig
    val dir = "/root/testdata/sf0.001"
    // coarser (4 x 16-dim subspaces, 8 codewords) and finer (16 x 4-dim)
    // than the pinned default — every row set must be exactly repeatable
    // (the ADC fold is deterministic by construction, not by luck)
    for (cfg <- Seq(PqConfig(m = 4, codes = 8), PqConfig(m = 16, codes = 16))) {
      val a = SimilarityQueries.annPq(spark, dir, cfg).collect().toSet
      val b = SimilarityQueries.annPq(spark, dir, cfg).collect().toSet
      assert(a == b, s"PQ at $cfg not deterministic")
      assert(a.groupBy(_.getLong(0)).forall(_._2.size == 5),
        s"expected exactly 5 neighbors per query at $cfg")
    }
    // a non-divisor subspace count is rejected up front
    intercept[IllegalArgumentException](PqConfig(m = 5))
  }
}
