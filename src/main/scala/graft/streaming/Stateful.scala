package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event for the stateful path. */
case class UserEvent(user_id: Long, ts: Timestamp, event_type: String,
                     value: Double)

/** Running per-user state. Values accumulate as integer cents — an
  * order-independent exact sum (a double fold would make the result
  * depend on shuffle-fetch order within the group). */
case class UserStats(user_id: Long, n_events: Long, total_cents: Long,
                     last_ts: Timestamp)

/** One emitted session summary. */
case class SessionSummary(user_id: Long, n_events: Long,
                          start_ts: Timestamp, end_ts: Timestamp)

/** Custom streaming state via `KeyValueGroupedDataset` — the genuinely
  * stateful operators Structured Streaming's windows can't express
  * (reference has none; its SQLite bookkeeping at retrieval.py:30-60 is
  * the nearest analog, done here with exactly-once checkpointed state).
  *
  * State is partitioned by key across executors — at 100 TB the only
  * scale limits are per-key state size (constant here) and key
  * cardinality (RocksDB state store handles billions).
  */
object Stateful {

  /** Running per-user aggregates with `mapGroupsWithState`: each
    * micro-batch folds new events into the user's state and emits the
    * updated row (Update output mode). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    implicit val statsEnc = Encoders.product[UserStats]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserStats, UserStats](
        GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(user, 0L, 0L, new Timestamp(0L)))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(user, acc.n_events + 1,
              acc.total_cents + math.floor(e.value * 100 + 0.5).toLong,
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Gap-based sessionization with `flatMapGroupsWithState` + event-time
    * timeout: a session closes when the watermark passes last-event +
    * gap, emitting one summary row (Append mode). This is the custom-
    * state form of `session_window` — the shape to extend when a session
    * needs logic a gap can't express. */
  def sessionize(events: Dataset[UserEvent], gapMs: Long): Dataset[SessionSummary] = {
    implicit val summaryEnc = Encoders.product[SessionSummary]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[SessionSummary]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed session end + gap → close and emit
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var current = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              current match {
                case Some(sess) if e.ts.getTime - sess.end_ts.getTime < gapMs =>
                  current = Some(sess.copy(
                    n_events = sess.n_events + 1,
                    end_ts = if (e.ts.after(sess.end_ts)) e.ts else sess.end_ts))
                case Some(sess) =>
                  closed += sess
                  current = Some(SessionSummary(user, 1L, e.ts, e.ts))
                case None =>
                  current = Some(SessionSummary(user, 1L, e.ts, e.ts))
              }
            }
            current.foreach { sess =>
              state.update(sess)
              state.setTimeoutTimestamp(sess.end_ts.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** [[runningUserStats]] on the `transformWithState` API (Spark 4's
    * successor to mapGroupsWithState): typed composable state handles
    * (`ValueState`/`ListState`/`MapState` per key, optional per-state
    * TTL) on the RocksDB state store — the surface that scales custom
    * state past executor memory. Semantics here are identical to the
    * mapGroupsWithState form (StatefulSpec proves it). */
  class RunningStatsProcessor
      extends StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var stats: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[UserStats](
        "stats", Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[UserStats] = {
      val prev = Option(stats.get())
        .getOrElse(UserStats(user, 0L, 0L, new Timestamp(0L)))
      val next = rows.foldLeft(prev) { (acc, e) =>
        UserStats(user, acc.n_events + 1,
          acc.total_cents + math.floor(e.value * 100 + 0.5).toLong,
          if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
      }
      stats.update(next)
      Iterator.single(next)
    }
  }

  /** Requires the RocksDB state store provider:
    * `spark.sql.streaming.stateStore.providerClass =
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`. */
  def runningUserStatsTws(events: Dataset[UserEvent]): Dataset[UserStats] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())(Encoders.product[UserStats])
}
