package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tables

/** Source/sink completeness beyond JSONL/CSV/parquet: ORC (the other
  * columnar warehouse format Spark ships natively) must round-trip the
  * relationalized output bit-exactly WITH pushdown/pruning intact, and the
  * `binaryFile` source is the real raw-media ingest path for the multimodal
  * surface (directory of opaque files -> (doc_id, media BINARY) -> the same
  * kernels the parquet-backed entries run).
  */
class FormatRoundTripSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ORC round-trip: relationalize-shaped rows (incl. array + struct) survive bit-exactly") {
    val tmp = Files.createTempDirectory("graft-orc").toString
    val src = Tables(spark, dir, "lineitem")
      .limit(200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_returnflag"),
        array(col("l_quantity"), col("l_discount")).as("nums"),
        struct(col("l_partkey").as("p"), col("l_suppkey").as("s")).as("keys"))
    src.write.mode("overwrite").orc(s"$tmp/t")
    val back = spark.read.orc(s"$tmp/t")
    // names + types must survive exactly; nullability legitimately WIDENS
    // (a file format cannot promise non-null for constructed containers)
    assert(back.schema.simpleString == src.schema.simpleString,
      "ORC must preserve names and types including nested containers")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getDouble(2),
      r.getString(3), r.getSeq[Double](4), (r.getStruct(5).getLong(0), r.getStruct(5).getLong(1))).toString
    assert(back.collect().map(key).sorted.toSeq == src.collect().map(key).sorted.toSeq)
  }

  test("ORC scan: predicate pushdown + column pruning reach the reader") {
    val tmp = Files.createTempDirectory("graft-orc-push").toString
    Tables(spark, dir, "lineitem").write.mode("overwrite").orc(s"$tmp/t")
    val q = spark.read.orc(s"$tmp/t")
      .filter(col("l_orderkey") === 42)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"),
      s"filter must reach the ORC reader:\n$scan")
    assert(scan.contains("struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must read only the projected columns:\n$scan")
  }

  test("binaryFile source: directory of opaque files drives the multimodal kernels") {
    val tmp = Files.createTempDirectory("graft-binfile").toString
    // three deterministic payloads; ids come from the file NAMES (the only
    // metadata a raw media directory has)
    val payloads = Map(1L -> Array.tabulate(300)(i => (i % 251).toByte),
      2L -> Array.tabulate(300)(i => ((i * 7) % 251).toByte),
      3L -> Array.tabulate(300)(_ => 0x41.toByte))
    payloads.foreach { case (id, bytes) =>
      Files.write(java.nio.file.Paths.get(s"$tmp/doc_$id.bin"), bytes)
    }
    val media = spark.read.format("binaryFile").load(s"$tmp/*.bin")
      .selectExpr(
        "CAST(regexp_extract(path, 'doc_(\\\\d+)\\\\.bin$', 1) AS BIGINT) AS doc_id",
        "content AS media")
    val sigs = graft.ops.MultimodalQueries.ahashSigsFrom(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the same kernel over the same bytes delivered as literals must agree —
    // the ingest path adds metadata, never perturbs content
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    val direct = payloads.toSeq.toDF("doc_id", "media")
      .selectExpr("doc_id", "ahash60(media) AS sig")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == direct && sigs.size == 3)
    assert(sigs(3L) == 0L || sigs(3L) != sigs(1L),
      "constant payload must not alias a varying payload") // sanity, not a pin
  }
}
