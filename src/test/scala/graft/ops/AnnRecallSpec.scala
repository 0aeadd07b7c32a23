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
}
