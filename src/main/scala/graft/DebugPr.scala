package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-bench for the pagerank edge-build pipeline (diagnostic only). */
object DebugPr {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }

    def li = ops.Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_partkey"))

    val grouped = li.groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("ps"))
    time("A groupBy collect_set (count)") { grouped.count() }
    time("A again") { grouped.count() }

    val exploded = grouped.select(explode(expr(
      "flatten(transform(ps, x -> transform(filter(ps, y -> x < y), " +
        "y -> struct(x AS src, y AS dst))))")).as("e"))
      .select(col("e.src"), col("e.dst"))
    time("B + nested-lambda explode (count)") { exploded.count() }
    time("B again") { exploded.count() }

    val dist = exploded.distinct()
    time("C + distinct (count)") { dist.count() }
    time("C again") { dist.count() }

    val win = dist.withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
    time("D + window deg (count)") { win.count() }
    time("D again") { win.count() }

    // alternative expansions
    val e2 = grouped.select(col("l_orderkey"), explode(col("ps")).as("src"))
      .join(grouped.select(col("l_orderkey"), col("ps")), "l_orderkey")
      .select(col("src"), explode(expr("filter(ps, y -> y > src)")).as("dst"))
    // double-explode without struct building
    val e3 = grouped
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "src")))
      .select(col("src"), explode(expr("filter(ps, y -> y > src)")).as("dst"))
    time("B3 double-explode no-struct (count)") { e3.count() }
    time("B3 again") { e3.count() }
    val d3 = e3.distinct()
    time("C3 + distinct") { d3.count() }

    // deg via agg+broadcast instead of window
    val deg = d3.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val j3 = d3.join(broadcast(deg), "src")
    time("D3 deg agg+bjoin (count, recomputes d3 2x)") { j3.count() }

    // persist edges then map-side deg join
    val dp = e3.distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("E persist edges (count)") { dp.count() }
    val deg2 = dp.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val j4 = dp.join(broadcast(deg2), "src")
    time("E deg bjoin over cache (count)") { j4.count() }
    spark.stop()
  }
}
