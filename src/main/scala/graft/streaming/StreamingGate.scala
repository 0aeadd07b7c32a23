package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{DedupQueries, Lifecycle, RelationalQueries, Tables}

/** The driver-gated face of the streaming surface.
  *
  * Every streaming operator in this package is spec-pinned (batch
  * equivalence, crash/replay, bounded state), but specs are not the
  * driver's oracle gate. These catalog entries run the REAL streaming
  * path — file source, state store, `Trigger.AvailableNow`, a terminating
  * query — over the gate corpus and return the sink contents as a static
  * frame, gated by the SAME DuckDB oracle as the operator's batch twin.
  * That makes "the streaming path produces the batch answer" a
  * hash-checked gate row instead of a test-suite claim.
  *
  * Shape: the input frame is staged to parquet once (the file source needs
  * files; the gate corpus arrives as a DataFrame), streamed back through
  * the operator, and drained into a memory sink. The sink is DRIVER-sized
  * by construction for these entries — one row per session / per shared
  * run, i.e. the operator's aggregated output, not the corpus — the same
  * bound the [[graft.ops.DriverMemo]] statistic families rely on; the
  * result is immediately checkpointed ([[Lifecycle.released]]) and the
  * sink's temp view dropped, so nothing streaming-scoped outlives the
  * entry (CacheLifecycleSpec's contract).
  */
object StreamingGate {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Stage `input`, stream it through `transform` to completion under
    * AvailableNow, and return the sink table checkpointed.
    *
    * @param outputMode "append" for flatMapGroups-style emission streams;
    *   "complete" for aggregations whose open state must surface at end of
    *   input (a finite gate corpus has no later watermark to close them).
    */
  private[streaming] def runToCompletion(input: DataFrame, outputMode: String,
      post: DataFrame => DataFrame = identity)
      (transform: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    val tmp = Files.createTempDirectory("graft-sgate")
    try {
      val inDir = s"$tmp/in"
      input.write.parquet(inDir)
      val schema = spark.read.parquet(inDir).schema
      val name = s"graft_sgate_${counter.incrementAndGet()}"
      val q = transform(spark.readStream.schema(schema).parquet(inDir))
        .writeStream.format("memory").queryName(name).outputMode(outputMode)
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try Lifecycle.released(post(spark.table(name)))
      finally spark.catalog.dropTempView(name)
    } finally {
      // the staged corpus + streaming checkpoint are per-invocation
      // scratch: delete them or every gate/spec run leaks a corpus copy
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p =>
          try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => })
    }
  }

  /** Catalog entry: event-gap sessions from the STREAMING merging
    * `session_window` aggregation run as a real stream — gated by the
    * batch `q_session_window` oracle (lag/cumulative-sum re-derivation in
    * DuckDB). Complete mode: the finite corpus ends with every session
    * still open state-wise, and complete output surfaces them all — the
    * same finite-input convention StreamingSessionizeSpec pins.
    */
  def sessionWindowStream(s: SparkSession, dir: String): DataFrame =
    runToCompletion(
      Tables(s, dir, "events").select("user_id", "ts"), "complete") {
      st => StreamingSessionize.sessions(st)
    }

  /** Catalog entry: exact-substring extraction through the STREAMING
    * anchor-state kernel ([[StreamingDedup.substringCandidates]]) run as a
    * real stream over the constructed overlap corpus — gated by the batch
    * `dedup_substring` oracle (the full winnow → anchor → verify → extend
    * re-derivation in DuckDB). AvailableNow with no file cap reads the
    * staged corpus as one micro-batch, where the kernel's per-bucket
    * (doc_id, pos) sort makes its min-anchor pairing coincide with the
    * batch all-pairs join — the overlap corpus carries each fingerprint on
    * at most the two sides of its pair (the same static-mode equivalence
    * StreamingDedupSpec pins, here hash-gated). The stream emits one run
    * PER FINGERPRINT bucket (every fingerprint inside a shared region
    * extends to the same maximal run); the batch entry collapses those
    * with distinct, so the gate frame does too.
    */
  def dedupSubstringStream(s: SparkSession, dir: String): DataFrame =
    runToCompletion(DedupQueries.overlapCorpus(s, dir), "append",
      post = _.distinct()) {
      st => StreamingDedup.substringCandidates(st).toDF()
    }

  /** Catalog entry: the Markov transition matrix from the STREAMING
    * last-event-state extraction ([[StreamingTransitions.transitions]])
    * run as a real stream — gated by the batch `q_transition_matrix`
    * oracle (lead-window derivation in DuckDB). Staging assigns each
    * event its per-user dense `seq` under the batch's (ts, event_id)
    * order, so the kernel's (seq, etype) within-batch fold IS the batch
    * order; the sink (one pair row per event — corpus-bounded at gate
    * scale; a production run points the pair stream at a file sink)
    * aggregates to counts + probabilities with the batch entry's exact
    * expression.
    */
  def transitionsStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val staged = Tables(s, dir, "events")
      .withColumn("seq", row_number().over(w))
      .selectExpr("user_id AS key", "CAST(seq AS LONG) AS seq",
        "event_type AS etype")
    runToCompletion(staged, "append", post = pairs => {
      val c = pairs.groupBy(col("from"), col("to")).agg(count(lit(1)).as("n"))
      // rename the key before re-aggregating: both sides derive from the
      // same sink view, and a bare self-join fails attribute resolution
      val tot = c.select(col("from").as("ftot"), col("n"))
        .groupBy(col("ftot")).agg(sum(col("n")).as("tot"))
      c.join(broadcast(tot), col("from") === col("ftot"))
        .select(col("from").as("event_type"), col("to").as("next_type"),
          col("n"),
          (col("n").cast("double") / col("tot").cast("double")).as("prob"))
    }) { st => StreamingTransitions.transitions(st).toDF() }
  }

  /** Catalog entry: Misra-Gries heavy hitters through the real streaming
    * path in its EXACTNESS regime — with distinct items ≤ k per shard the
    * sketch's counters ARE the exact counts (the spec-pinned guarantee),
    * so the event-type frequency table it emits is gated by a plain
    * batch GROUP BY oracle. Each item hashes to exactly one shard, so
    * summing the per-shard counters per token is the per-token count.
    * AvailableNow with no file cap drains the staged corpus as one
    * micro-batch (the same one-batch convention as the substring entry),
    * so the append-mode snapshot in the sink is the final counter state.
    */
  def heavyHittersStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    runToCompletion(
      Tables(s, dir, "events").selectExpr("event_type AS item"), "append",
      post = snap => snap.groupBy(col("token"))
        .agg(sum(col("est")).as("n"))
        .selectExpr("token AS event_type", "CAST(n AS BIGINT) AS n")) {
      st => StreamingSketch.heavyHitters(st).toDF()
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_session_window" -> sessionWindowStream,
    "stream_dedup_substring" -> dedupSubstringStream,
    "stream_transitions" -> transitionsStream,
    "stream_heavy_hitters" -> heavyHittersStream,
  )

  /** The batch twins' oracles, verbatim: the POINT of these entries is
    * that the streaming path must reproduce the batch answer.
    */
  val oracleSql: Map[String, String] = Map(
    "stream_session_window" -> RelationalQueries.oracleSql("q_session_window"),
    "stream_dedup_substring" -> DedupQueries.oracleSql("dedup_substring"),
    "stream_transitions" -> RelationalQueries.oracleSql("q_transition_matrix"),
    "stream_heavy_hitters" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
  )
}
