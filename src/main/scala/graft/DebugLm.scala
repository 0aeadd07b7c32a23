package graft

import org.apache.spark.sql.SparkSession

object DebugLm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val df = graft.ops.TextQueries.lmScore(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(s"[debug] lmScore: ${(System.nanoTime() - t0) / 1e9} s")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    val n = spark.sql(s"SELECT sum(size(split(trim(text), '\\\\s+'))) FROM parquet.`$dir/documents.parquet`").head()
    println(s"[debug] total tokens: $n")
    spark.stop()
  }
}
