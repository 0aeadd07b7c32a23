package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract for the whole public catalog: a long-lived
  * session composing catalog ops must not accumulate cached partitions.
  * Every entry that persists intermediates (dedup signatures, LSH bands,
  * the IVF index, the relationalize emit) materializes its result and
  * releases them before returning ([[Lifecycle]]) — pinned here by running
  * EVERY public query to completion and asserting the block store is empty
  * after each one, with no `clearCache()` anywhere.
  */
class CacheLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // reliable checkpoints: Lifecycle.released's fallback (localCheckpoint)
    // would itself keep the small RESULT cached until GC
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-lifecycle-ckpt").toString)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("every public catalog query leaves no persisted RDDs behind") {
    spark.catalog.clearCache() // start from a clean block store, then never again
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} cached RDDs: ${leaked.values.map(_.name).mkString(", ")}")
    }
  }

  test("a FAILING materialization still releases the persisted inputs") {
    spark.catalog.clearCache()
    val input = spark.range(10).toDF("x")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val failing = input.selectExpr("assert_true(x < 5) AS ok", "x")
    intercept[Throwable] {
      Lifecycle.releasedBy(failing)(input.unpersist())
    }
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"failure path leaked ${leaked.size} cached RDDs")
  }

  test("the fenced quadratic baselines release their barriers too") {
    spark.catalog.clearCache()
    graft.SparkEntry.oracleBaselines.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} cached RDDs: ${leaked.values.map(_.name).mkString(", ")}")
    }
  }
}
