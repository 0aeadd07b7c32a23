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
    val dir = "/root/testdata/sf0.001"
    println("[debug] direct events read:")
    try {
      val df = graft.ops.Tables(spark, dir, "events")
      println(s"[debug] schema=${df.schema.simpleString.take(200)}")
      println(s"[debug] rows=${df.count()}")
    } catch { case e: Throwable => println(s"[debug] FAILED: ${e.getMessage.take(300)}") }
    println("[debug] now after a documents read:")
    graft.ops.Tables(spark, dir, "documents").count()
    try {
      val df = graft.ops.Tables(spark, dir, "events")
      println(s"[debug] schema=${df.schema.simpleString.take(200)}")
    } catch { case e: Throwable => println(s"[debug] FAILED: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
