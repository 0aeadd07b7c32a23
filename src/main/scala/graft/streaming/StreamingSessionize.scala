package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time gap sessionization for streams.
  *
  * The batch engine answers "sessions per user" with `q_sessionize`'s
  * lag-window derivation — a full-history sort per user. A stream cannot
  * sort history; the Spark-first answer is the built-in merging
  * `session_window` aggregation: the state store keeps one entry per OPEN
  * session (start, current end = last event + gap, partial aggs), an
  * arriving event either extends/merges windows it overlaps or opens a new
  * one, and the watermark both closes sessions (no event can extend a
  * window whose end precedes it) and evicts their state. State is
  * proportional to concurrently-open sessions — not history — the same
  * bounded-memory contract as [[StreamingDedup]] / [[StreamingSketch]].
  *
  * Boundary semantics (spec-pinned): `session_window` treats its half-open
  * [t, t+gap) windows as merging even when they merely TOUCH, so an event
  * exactly `gap` after its predecessor still extends the session — only
  * `diff > gap` opens a new one. That is the same convention as the batch
  * `q_sessionize` entry, so the two surfaces agree everywhere.
  *
  * Production mode is Append (emit each session once, when the watermark
  * closes it); the spec drives Complete over finite input to observe every
  * session including still-open ones.
  */
object StreamingSessionize {

  /** Sessions per user over an `events`-shaped frame (user_id, ts, ...):
    * one row per session with its event count. Works on both streaming and
    * static frames (the watermark only applies to streams).
    */
  def sessions(events: DataFrame, gapSeconds: Long = 1800L,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    withWm
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }
}
