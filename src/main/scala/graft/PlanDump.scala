package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dump `.explain("formatted")` for catalog queries to files — the committed
  * evidence for optimization-round plan claims (`plans/r12/<name>_<tag>.txt`).
  *
  * `sbt "runMain graft.PlanDump <tag> <outDir> <name>[,name...]"`
  *
  * Public catalog entries built around persist barriers EAGERLY materialize
  * and return a checkpointed LogicalRDD (see [[graft.ops.Lifecycle]]) — their
  * public plan is a stub. For those, this tool dumps the LAZY plan twin where
  * one exists (the kernel whose shape the optimization actually changed),
  * falling back to the public entry otherwise. The dumped text is the
  * pre-execution plan (`AdaptiveSparkPlan isFinalPlan=false` where AQE
  * applies), which pins Exchange count, join strategy, PushedFilters and
  * ReadSchema — the properties the round's claims cite.
  */
object PlanDump {

  /** Lazy-plan overrides for checkpointing entries; everything else resolves
    * through [[SparkEntry.queries]] (lazy for plain relational entries).
    */
  private def lazyPlans(s: SparkSession, dir: String): Map[String, () => DataFrame] = Map(
    "dedup_embedding_lsh" -> (() => ops.DedupQueries.dedupEmbeddingLshPlan(s, dir)._1),
    // iterative kernels: the plan that runs N times per query is the ROUND
    // plan over the prepared inputs, dumped as <name>_round
    "mm_ahash_dedup" -> (() => ops.MultimodalQueries.ahashDedupFrom(
      ops.Tables(s, dir, "documents")
        .selectExpr("doc_id", "CAST(text AS BINARY) AS media"))._1),
    "mm_frame_dedup" -> (() => ops.MultimodalQueries.frameDedupPlan(s, dir)._1),
    "q_pagerank_round" -> (() => ops.IterativeQueries.pagerankRoundPlan(s, dir)._1),
    "q_pagerank_directed_round" -> (() => ops.IterativeQueries.pagerankDirectedRoundPlan(s, dir)._1),
    "q_kcore_round" -> (() => ops.IterativeQueries.kcoreRoundPlan(s, dir)._1),
    // rich-arm Jaccard verification (lazy: candidates + verify join, the
    // part the graft_overlap change restructured)
    "dedup_jaccard_rich_verify" -> { () =>
      val (docs, cand) = ops.DedupQueries.jaccardPrefixCandidates(
        ops.TextQueries.richCorpus(s, dir))
      ops.DedupQueries.jaccardVerified(docs, cand)
        .filter(org.apache.spark.sql.functions.expr("inter * 2 >= union_sz"))
    },
    // r11-shape reconstruction of the same verify join (commit c3e5bee,
    // DedupQueries.scala:482-488): array_intersect evaluated per output
    // column. Expressions copied verbatim from `git show c3e5bee`.
    "dedup_jaccard_rich_verify_r11shape" -> { () =>
      val (docs, cand) = ops.DedupQueries.jaccardPrefixCandidates(
        ops.TextQueries.richCorpus(s, dir))
      import org.apache.spark.sql.functions.{col, expr}
      cand
        .join(docs.as("da"), col("doc_a") === col("da.doc_id"))
        .join(docs.as("db"), col("doc_b") === col("db.doc_id"))
        .selectExpr("doc_a", "doc_b",
          "CAST(size(array_intersect(da.tset, db.tset)) AS BIGINT) AS inter",
          "CAST(size(da.tset) + size(db.tset) - size(array_intersect(da.tset, db.tset)) AS BIGINT) AS union_sz")
        .filter(expr("inter * 2 >= union_sz"))
    },
    // r11-shape reconstruction of the pagerank round (commit c3e5bee,
    // IterativeQueries.scala:236-280): edges cached on the WINDOW's src
    // partitioning (no dst re-key) and per-round crossJoin(consts) — the
    // "before" evidence for the round-12 optimization, rebuilt here because
    // the plan-dump tooling postdates that commit. Expressions copied
    // verbatim from `git show c3e5bee`.
    "q_pagerank_round_r11shape" -> { () =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.storage.StorageLevel
      val scale = 1000000000000L
      val li = ops.Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, x -> transform(filter(ps, y -> y != x), " +
            "y -> struct(x AS src, y AS dst))))")).as("e"))
        .select(col("e.src"), col("e.dst"))
        .distinct()
      val edgesDeg = edges
        .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val consts = broadcast(edgesDeg.agg(countDistinct(col("src")).as("n")).select(
        expr(s"((CAST($scale AS BIGINT) * 15) div 100) div n").as("base"),
        expr(s"CAST($scale AS BIGINT) div n").as("init")))
      val init0 = edgesDeg.select(col("src").as("node")).distinct()
        .crossJoin(consts)
        .select(col("node"), col("init").as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      init0.count()
      val ranks = s.createDataFrame(init0.rdd, init0.schema)
      edgesDeg.join(broadcast(ranks), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div deg")).as("contrib"))
        .crossJoin(consts)
        .select(col("dst").as("node"),
          expr("base + (85 * contrib) div 100").as("rank"))
    },
  )

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    java.nio.file.Files.createDirectories(outDir)
    val overrides = lazyPlans(spark, sfDir)
    names.foreach { name =>
      val df = overrides.get(name).map(_.apply())
        .getOrElse(SparkEntry.queries(name)(spark, sfDir))
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), text)
      System.err.println(s"[plandump] wrote ${name}_$tag.txt (${text.length} chars)")
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(ckptDir.toFile)
  }
}
