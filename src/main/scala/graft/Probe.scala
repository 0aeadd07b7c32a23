package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan + timing probe for one catalog query:
  * `sbt "runMain graft.Probe <name> [sfDir]"` prints the optimized logical
  * plan, the executed plan, and three timed runs. Diagnostic only — the
  * recorded numbers live in Bench.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println("=== optimizedPlan ===")
    println(df.queryExecution.optimizedPlan.toString.take(8000))
    println("=== executedPlan ===")
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.take(8000))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
