package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job profile of one catalog query: wall, summed task run/cpu time and
  * task count per Spark job, in submission order — the "which of this
  * query's ~N jobs is the expensive one" question Bench's per-query totals
  * cannot answer. Diagnostic only.
  *
  * `sbt "runMain graft.Diagnose <name> [sfDir]"`
  */
object Diagnose {

  private final class JobProfiler extends SparkListener {
    final class J {
      var submitted = 0L; var completed = 0L
      var taskRunMs = 0L; var taskCpuMs = 0L; var tasks = 0; var gcMs = 0L
      var desc = ""
    }
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    private val stageToJob = mutable.HashMap.empty[Int, Int]

    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val j = new J
      j.submitted = e.time
      j.desc = Option(e.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.completed = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null) stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.taskRunMs += m.executorRunTime
        j.taskCpuMs += m.executorCpuTime / 1000000L
        j.gcMs += m.jvmGCTime
        j.tasks += 1
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
    def report(): Unit = synchronized {
      println(f"${"job"}%4s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"gc"}%6s ${"tasks"}%6s  desc")
      var tw = 0L; var tr = 0L
      jobs.foreach { case (id, j) =>
        val wall = if (j.completed > 0) j.completed - j.submitted else -1
        tw += math.max(wall, 0); tr += j.taskRunMs
        println(f"$id%4d $wall%8d ${j.taskRunMs}%8d ${j.taskCpuMs}%8d ${j.gcMs}%6d ${j.tasks}%6d  ${j.desc.take(60)}")
      }
      println(f"TOTAL jobs=${jobs.size} wall=$tw%d ms taskrun=$tr%d ms")
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    val prof = new JobProfiler
    spark.sparkContext.addSparkListener(prof)
    val catalog = SparkEntry.queries
    // run 0 = warm-up (JIT), run 1 = profiled
    for (run <- 0 to 1) {
      spark.catalog.clearCache()
      prof.reset()
      val t0 = System.nanoTime()
      catalog(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"=== run $run: $name $dt%.2f s ===")
    }
    // listener bus is async — give trailing events a moment
    Thread.sleep(500)
    prof.report()
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(ckptDir.toFile)
  }
}
