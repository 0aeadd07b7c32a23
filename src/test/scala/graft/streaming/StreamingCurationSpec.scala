package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CurationQueries

/** The curation samplers on a STREAM: because the keep/copy decision is a
  * pure function of row content (md5 of the doc key — no RNG, no window, no
  * state), [[CurationQueries.sampleFrom]] and
  * [[CurationQueries.upsampleFrom]] run unchanged as stateless streaming
  * transforms, and the union of micro-batch outputs equals the batch kernel
  * on the same rows regardless of how the stream chops them up. That
  * batch-boundary independence is the property a Bernoulli `rand()` sampler
  * does NOT have, and it is what makes the epoch stream reproducible when a
  * 100 TB ingest is replayed with different file groupings.
  */
class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType)))

  /** Write the corpus as 3 jsonl files (distinct mtimes so batch order is
    * deterministic), stream with maxFilesPerTrigger=1, and return the
    * memory-sink rows after the stream drains.
    */
  private def streamed(tmp: String, transform: org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.DataFrame, sink: String): Seq[org.apache.spark.sql.Row] = {
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$tmp/in")
    val q = transform(in).writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink).collect().toSeq
  }

  private def writeCorpus(tmp: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    val langs = Seq("en", "de", "fr", "xx")
    (0 until 3).foreach { b =>
      val lines = (0 until 40).map { i =>
        val id = b * 40 + i
        s"""{"doc_id": $id, "lang": "${langs(id % 4)}", "source": "src${id % 3}"}"""
      }
      val p = java.nio.file.Paths.get(s"$tmp/in/b$b.jsonl")
      Files.writeString(p, lines.mkString("\n"))
      // distinct mtimes: FileStreamSource orders pending files by mtime
      p.toFile.setLastModified(1700000000000L + b * 2000L)
    }
  }

  test("stratified sampling on a stream equals the batch kernel on the same rows") {
    val tmp = Files.createTempDirectory("graft-scur").toString
    writeCorpus(tmp)
    val out = streamed(tmp, df => CurationQueries.sampleFrom(df), "scur_sample")
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val batch = CurationQueries.sampleFrom(
      spark.read.schema(schema).json(s"$tmp/in")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(out == batch,
      "content-hash sampling must be independent of micro-batch chopping")
    assert(batch.nonEmpty && batch.size < 120, "sample is a strict non-empty subset")
  }

  test("upsampling on a stream emits exactly the batch epoch copies") {
    val tmp = Files.createTempDirectory("graft-scur2").toString
    writeCorpus(tmp)
    val out = streamed(tmp, df => CurationQueries.upsampleFrom(df), "scur_up")
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(identity).view.mapValues(_.size).toMap
    val batch = CurationQueries.upsampleFrom(
      spark.read.schema(schema).json(s"$tmp/in")).collect()
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(identity).view.mapValues(_.size).toMap
    assert(out == batch, "per-(doc, epoch) multiplicity must match the batch kernel")
    // the 250% default stratum ('xx') must emit 2 or 3 copies per doc
    val copies = batch.keys.groupBy(_._1).view.mapValues(_.size)
    assert(copies.values.exists(_ >= 2), "some doc must be upsampled")
  }
}
