package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Codegen-strictness gate: every catalog query must execute with
  * `spark.sql.codegen.fallback=false`, so a custom expression whose generated
  * Java fails to compile (janino error) aborts the test instead of silently
  * degrading to interpreted execution. Regression context: `Hash60.doGenCode`
  * originally emitted `Hash60.eval($c)`, which Java could not resolve (scalac
  * suppresses the companion static forwarder when the class already declares
  * `eval`), so every dedup/minhash stage fell out of whole-stage codegen.
  */
class CodegenStrictSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("hash60 projection stays inside a whole-stage-codegen span") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Tables(spark, dir, "documents")
      .select(graft.functions.GraftFunctions.hash60(col("text")).as("h"))
    df.collect() // throws under fallback=false if generated code cannot compile
    val plan = df.queryExecution.executedPlan.toString
    // the Project evaluating hash60 must carry a codegen-stage marker
    assert(plan.linesIterator.exists(l => l.contains("Project") && l.contains("*(")),
      s"hash60 projection not codegen'd:\n$plan")
  }

  test("vec_dot projection stays inside a whole-stage-codegen span") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Tables(spark, dir, "embeddings")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .select(graft.functions.GraftFunctions.vecDot(col("v"), col("v")).as("d"))
    df.collect() // throws under fallback=false if generated code cannot compile
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") && l.contains("*(")),
      s"vec_dot projection not codegen'd:\n$plan")
  }

  // Every catalog query (public + fenced baselines) under strict codegen —
  // a compile failure in any generated stage throws instead of silently
  // interpreting.
  for ((name, q) <- (graft.SparkEntry.queries ++ graft.SparkEntry.oracleBaselines)
      .toSeq.sortBy(_._1)) {
    test(s"catalog query $name executes with codegen fallback disabled") {
      val rows = q(spark, dir).count()
      assert(rows >= 0)
    }
  }
}
