package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through a `noop` sink write — unlike `count()`, this
  * defeats column pruning so the measured work includes every projected
  * expression (string funcs, minhash signatures, ...), not just row counting.
  */
object Bench {

  /** Representative heavy set: relationalize round-trips, the shuffle-bound
    * join/agg/window core, and the pipeline ops. The quadratic pair-oracles
    * (dedup_jaccard, simhash_pairs) are correctness checks, not throughput
    * paths, and stay out of the headline.
    */
  val headline: Seq[String] = Seq(
    "rel_flat", "rel_explode", "rel_choice",
    "q_filter_project", "q_agg_pricing", "q_agg_stats",
    "q_join_big", "q_join_star", "q_left_join",
    "q_window_running", "q_window_rank", "q_sessionize", "q_pivot",
    "dedup_exact", "dedup_minhash_sig", "dedup_minhash_lsh",
    "ann_bruteforce", "ann_ivf",
    "text_quality", "text_langid", "mm_features")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()

    val catalog = SparkEntry.queries
    val results = headline.filter(catalog.contains).map { name =>
      spark.catalog.clearCache() // isolate queries: no cross-query cache leaks
      val t0 = System.nanoTime()
      try catalog(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-20s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
