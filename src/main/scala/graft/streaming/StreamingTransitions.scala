package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-flow (Markov transition) extraction with ONE string of
  * state per key.
  *
  * The batch engine answers "how do users move between event types" with
  * `q_transition_matrix` (lead window → grouped counts); a stream wants the
  * transition pairs continuously. The whole per-user history collapses to
  * its LAST event type: each arriving event emits one (from, to) pair
  * against the carried state and replaces it — `flatMapGroupsWithState`
  * with bounded state, the same contract as [[StreamingMetrics]] /
  * [[StreamingSketch]]. Downstream aggregates pairs into the matrix with
  * an ordinary streaming count (or any sink).
  *
  * Ordering contract (spec-pinned): within a batch, events fold in
  * (seq, etype) order — layout-independent; across batches, arrival order
  * IS event order. When batches respect `seq` order, the emitted pair
  * multiset equals the batch lead-window derivation over the full history.
  */
object StreamingTransitions {

  /** One event: `seq` orders within a batch (event time / line number). */
  final case class Ev(key: Long, seq: Long, etype: String)

  /** One observed transition. */
  final case class Trans(key: Long, from: String, to: String)

  /** Per-key transition pairs over a (streaming or static) frame with
    * (key, seq, etype) columns. Append mode: each pair is emitted exactly
    * once, in the micro-batch that completes it.
    */
  def transitions(events: DataFrame): Dataset[Trans] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("CAST(key AS LONG) AS key", "CAST(seq AS LONG) AS seq",
        "CAST(etype AS STRING) AS etype")
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[String, Trans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[String]) =>
          val sorted = rows.toArray.sortBy(e => (e.seq, e.etype))
          val out = Vector.newBuilder[Trans]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += Trans(key, p, e.etype))
            prev = Some(e.etype)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** One raw event for the SELF-SEQUENCING kernel: `tsm` is the event time
    * (any monotone long — unix micros), `eid` breaks time ties (the batch
    * `q_transition_matrix` order is (ts, event_id)).
    */
  final case class EvOrd(key: Long, tsm: Long, eid: Long, etype: String)

  /** [[transitions]] with the per-user sequencing INSIDE the stateful
    * kernel — no upstream `row_number` staging: each micro-batch's events
    * fold in (tsm, eid) order, and the state carries the user's last
    * (tsm, eid, etype) so the chain is stitched ACROSS micro-batches by
    * carried state alone. The remaining arrival contract is the natural
    * one any log-structured upstream provides: a user's events do not
    * arrive in an EARLIER micro-batch than a later event (per-key order in
    * kafka, time-ranged file drops). Within that contract the emitted pair
    * multiset equals the batch lead-window derivation; a violation would
    * emit pairs in arrival order (the same documented rule as
    * [[transitions]]), never crash.
    */
  def transitionsOrdered(events: DataFrame): Dataset[Trans] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("CAST(key AS LONG) AS key", "CAST(tsm AS LONG) AS tsm",
        "CAST(eid AS LONG) AS eid", "CAST(etype AS STRING) AS etype")
      .as[EvOrd]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, String), Trans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toArray.sortBy(e => (e.tsm, e.eid))
          val out = Vector.newBuilder[Trans]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach { case (_, _, p) => out += Trans(key, p, e.etype) }
            prev = Some((e.tsm, e.eid, e.etype))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
