package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key metric smoothing with O(1) state per key.
  *
  * The batch engine answers "smoothed metric per entity" with `q_ewma`'s
  * collect-and-fold; a stream wants the same value continuously as
  * observations arrive. EWMA is the canonical choice precisely BECAUSE its
  * state is one number: `y <- (y + x) / 2` (alpha = 1/2, exact in IEEE
  * doubles — the same fold the batch oracle pins), carried across
  * micro-batches as `mapGroupsWithState` state. No window buffer, no
  * per-observation retention — the bounded-memory contract of
  * [[StreamingSketch.heavyHitters]] and [[StreamingDedup]].
  *
  * Ordering contract (spec-pinned): within a batch, observations fold in
  * `(seq, x)` order — layout-independent; across batches, arrival order IS
  * event order (the usual at-ingest assumption — a late observation folds
  * late, exactly like every streaming metric pipeline). When batches
  * respect `seq` order, the final state equals the batch [[q_ewma]] fold
  * over the full history (the equivalence the spec replays).
  */
object StreamingMetrics {

  /** One observation: `seq` orders within a batch (any unique-ish sequence
    * number — a line number, an event time), `x` is the measured value.
    */
  final case class Obs(key: Long, seq: Long, x: Double)

  /** Per-key running state: the smoothed value and the observation count. */
  final case class Smoothed(key: Long, ewma: Double, n: Long)

  /** One anomaly verdict: the observation, the smoothed level and absolute
    * deviation BEFORE it folded in, and the flag.
    */
  final case class Anomaly(key: Long, seq: Long, x: Double,
      level: Double, dev: Double, anomaly: Boolean)

  /** Streaming per-key anomaly flags from TWO doubles of state: the EWMA
    * level and the exponentially-weighted mean absolute deviation (both
    * alpha = 1/2 halving folds — exact dyadic arithmetic, the [[ewma]]
    * contract). An observation is flagged when it sits more than
    * 3 x the CURRENT deviation estimate from the CURRENT level — both
    * read BEFORE the observation folds in, so an anomaly cannot mask
    * itself — then both states absorb it. The first `warmup` observations
    * of a key only train state (a deviation estimate of zero flags
    * everything; the standard burn-in). The streaming shape of
    * `q_anomaly_mad`: that entry is the retrospective batch sweep (exact
    * medians need the whole history), this is the O(1)-state online
    * monitor.
    */
  def anomalies(obs: DataFrame, warmup: Int = 3): Dataset[Anomaly] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.selectExpr("CAST(key AS LONG) AS key", "CAST(seq AS LONG) AS seq",
        "CAST(x AS DOUBLE) AS x")
      .as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Double, Double, Long), Anomaly](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Double, Double, Long)]) =>
          var (level, dev, n) = state.getOption.getOrElse((0.0, 0.0, 0L))
          val out = Vector.newBuilder[Anomaly]
          rows.toArray.sortBy(o => (o.seq, o.x)).foreach { o =>
            val flag = n >= warmup && math.abs(o.x - level) > 3.0 * dev
            out += Anomaly(key, o.seq, o.x, level, dev, flag)
            if (n == 0L) { level = o.x; dev = 0.0 }
            else {
              dev = (dev + math.abs(o.x - level)) / 2
              level = (level + o.x) / 2
            }
            n += 1
          }
          state.update((level, dev, n))
          out.result().iterator
      }
  }

  /** Per-key Holt state: smoothed level + trend and the observation count. */
  final case class HoltState(key: Long, level: Double, trend: Double, n: Long)

  /** Holt double-exponential smoothing (alpha = beta = 1/2) per key — the
    * streaming twin of the batch `q_holt` fold, three numbers of state per
    * key: init (level = first x, trend = 0), then
    * `level' = (x + (level + trend)) / 2`,
    * `trend' = ((level' - level) + trend) / 2` — every value a dyadic
    * halving fold, bit-exact cross-engine. Update mode like [[ewma]]:
    * each micro-batch re-emits a touched key's current state; downstream
    * keeps the latest emission per key.
    */
  def holt(obs: DataFrame): Dataset[HoltState] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.selectExpr("CAST(key AS LONG) AS key", "CAST(seq AS LONG) AS seq",
        "CAST(x AS DOUBLE) AS x")
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState[(Double, Double, Long), HoltState](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Double, Double, Long)]) =>
          var (l, t, n) = state.getOption.getOrElse((0.0, 0.0, 0L))
          rows.toArray.sortBy(o => (o.seq, o.x)).foreach { o =>
            if (n == 0L) { l = o.x; t = 0.0 }
            else {
              val l2 = (o.x + (l + t)) / 2
              t = ((l2 - l) + t) / 2
              l = l2
            }
            n += 1
          }
          state.update((l, t, n))
          HoltState(key, l, t, n)
      }
  }

  /** EWMA (alpha = 1/2) per key over a (streaming or static) frame with
    * (key, seq, x) columns. Each micro-batch re-emits a touched key's
    * current smoothed value (Update mode — `mapGroupsWithState`'s required
    * streaming mode); downstream keeps the latest emission per key.
    */
  def ewma(obs: DataFrame): Dataset[Smoothed] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.selectExpr("CAST(key AS LONG) AS key", "CAST(seq AS LONG) AS seq",
        "CAST(x AS DOUBLE) AS x")
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState[(Double, Long), Smoothed](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Double, Long)]) =>
          val (y0, n0) = state.getOption.getOrElse((0.0, 0L))
          val (y, n) = rows.toArray.sortBy(o => (o.seq, o.x))
            .foldLeft((y0, n0)) { case ((y, n), o) => ((y + o.x) / 2, n + 1) }
          state.update((y, n))
          Smoothed(key, y, n)
      }
  }
}
