package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting, exercised locally: a 90%-hot-key join with the
  * skew thresholds lowered to test scale must (a) trigger the runtime skew
  * split — the `skew=true` marker on the sort-merge join — and (b) still
  * produce exactly the unskewed join's result. This is the no-salt half of
  * the skew story (the salted-join equivalence lives in
  * SkewAndStreamingSpec); together they cover both mitigations a 100 TB
  * deployment combines.
  */
class SkewSplitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // scale the detection thresholds down to the test corpus: a partition
    // is "skewed" past 16 KB and 1x the median — the same knobs, small data
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("AQE splits the hot partition of a skewed join and preserves the result") {
    import spark.implicits._
    // 90% of the left side hits key 0; right side is uniform
    val left = spark.range(200000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id % 1000 END AS k",
        "CAST(id AS STRING) AS payload",
        // widen rows so the hot partition crosses the byte threshold
        "repeat('x', 64) AS pad")
    val right = spark.range(1000).selectExpr("id AS k", "id * 7 AS w")
    // max(payload) keeps the wide columns alive through the join, so the hot
    // partition's shuffle bytes reflect real row width (no pruning to the key)
    val joined = left.join(right, "k")
      .groupBy("k").agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col("pad")).as("mp"))

    val rows = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not split the skewed join:\n$plan")

    // correctness under the split: identical to the arithmetic expectation
    assert(rows(0L) == 180000L, s"hot key count wrong: ${rows.get(0L)}")
    assert(rows.size == 101, s"expected 101 keys, got ${rows.size}")
    val cold = rows.filter(_._1 != 0L)
    assert(cold.values.forall(_ == 200L), s"cold key counts wrong: ${cold.take(5)}")
  }
}
