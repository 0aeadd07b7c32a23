package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spill-path correctness: at 100 TB the window buffers and join state do
  * NOT fit in memory — operators run their external (spilling) code paths.
  * Local test data never triggers them, so this spec forces the in-memory
  * thresholds to 1 row and pins that (a) the external path actually engages
  * (spill metrics / external sorter in the plan) and (b) results are
  * IDENTICAL to the in-memory path — the property that makes memory
  * pressure a performance event, not a correctness event.
  */
class SpillSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def withSpillThresholds[T](f: => T): T = {
    val confs = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "8")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("window results are identical when every partition buffer spills") {
    val inMem = canon(RelationalQueries.windowRunning(spark, dir).collect())
    withSpillThresholds {
      val df = RelationalQueries.windowRunning(spark, dir)
      val spilled = canon(df.collect())
      assert(spilled == inMem, "spilling must not change window results")
      // under AQE the WindowExec lives inside query-stage wrappers
      def windows(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.window.WindowExec] = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          windows(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => windows(q.plan)
      }.flatten
      val metrics = windows(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("spillSize")).map(_.value)
      assert(metrics.exists(_ > 0),
        s"window buffer never spilled despite 1-row threshold: $metrics")
    }
  }

  test("sort-merge join results are identical when the match buffer spills") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = () => RelationalQueries.leftOuterJoin(spark, dir)
      val inMem = canon(q().collect())
      withSpillThresholds {
        assert(canon(q().collect()) == inMem,
          "spilling must not change join results")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
