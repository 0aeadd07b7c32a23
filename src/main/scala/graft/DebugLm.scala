package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (not part of the driver contract). */
object DebugLm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.001"
    val plain = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", s"split(trim(lower(text)), '[${graft.ops.Tokenize.WsClassSql}]+') AS t")
      .filter("size(t) >= 4")
      .selectExpr("doc_id",
        "explode(transform(sequence(1, size(t) - 3), i -> array_join(slice(t, i, 4), ' '))) AS g")
    val barriered = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", s"graft_barrier(split(trim(lower(text)), '[${graft.ops.Tokenize.WsClassSql}]+')) AS t")
      .filter("size(t) >= 4")
      .selectExpr("doc_id",
        "explode(transform(sequence(1, size(t) - 3), i -> array_join(slice(t, i, 4), ' '))) AS g")
    for ((name, df) <- Seq("plain" -> plain, "barriered" -> barriered)) {
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val nsplit = "split\\(".r.findAllIn(p).length
      println(s"[debug] $name: split() occurrences in plan = $nsplit")
      println(p.linesIterator.filter(l => l.contains("Generate") || l.contains("Project")).take(4).mkString("\n").take(600))
      val n = df.count()
      println(s"[debug] $name rows=$n")
    }
    spark.stop()
  }
}
