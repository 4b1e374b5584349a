package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Gap-based sessionization over an event stream with CUSTOM per-key
 * state (`flatMapGroupsWithState` + event-time timeout) — the
 * streaming analog of the batch q_sessions window query, for state
 * shapes the built-in windowed aggregations cannot express (an open
 * session of unbounded length that closes only after `gapSeconds` of
 * per-user silence).
 *
 * Per user: events fold into the open session while the gap to the
 * previous event is <= gapSeconds; a larger gap (or an event-time
 * timeout once the watermark passes lastTs + gap) closes the session
 * and emits (user_id, session_id, n_events, first_event) — session
 * ids are 1-based per user in event-time order, matching the batch
 * query's cumulative-flag numbering.
 */
object StreamingSessions {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class OpenSession(sessionId: Long, lastTsMicros: Long,
                               n: Long, firstEvent: Long)
  final case class Session(user_id: Long, session_id: Long,
                           n_events: Long, first_event: Long)

  /**
   * `events` must already carry a watermark on `ts`.
   *
   * @param tombstoneSeconds how long a timed-out user's session
   *        counter is retained (as an n == 0 tombstone) so a
   *        returning user continues numbering at sessionId + 1. The
   *        tombstone expires via its own event-time timeout, so state
   *        stays bounded by the RECENTLY-ACTIVE user count, not every
   *        user ever seen; a user silent longer than this restarts at
   *        session 1 (the documented trade-off of bounded state).
   */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 3600L,
                 tombstoneSeconds: Long = 30L * 24 * 3600): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    val gapMicros = gapSeconds * 1000000L

    def flush(user: Long, st: OpenSession): Session =
      Session(user, st.sessionId, st.n, st.firstEvent)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            state.getOption match {
              case Some(st) if st.n > 0 =>
                // watermark passed lastTs + gap with no new events:
                // the open session is final. Keep the counter as an
                // n == 0 tombstone — a user who returns continues at
                // sessionId + 1 instead of restarting at 1 (the batch
                // query's cumulative numbering) — and give the
                // tombstone its own expiry so state stays bounded
                state.update(st.copy(n = 0))
                state.setTimeoutTimestamp(math.max(
                  state.getCurrentWatermarkMs() + 1,
                  st.lastTsMicros / 1000L + tombstoneSeconds * 1000L))
                Iterator.single(flush(user, st))
              case _ =>
                // an expiring tombstone: the retention horizon passed
                state.remove()
                Iterator.empty
            }
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              val tsMicros = e.ts.getTime * 1000L
              open = open match {
                case Some(st) if st.n > 0 && tsMicros - st.lastTsMicros <= gapMicros =>
                  // first_event is the session MIN event id (batch parity)
                  Some(st.copy(lastTsMicros = math.max(st.lastTsMicros, tsMicros),
                    n = st.n + 1,
                    firstEvent = math.min(st.firstEvent, e.event_id)))
                case Some(st) =>
                  // open session past its gap, or an n == 0 tombstone
                  // (a timed-out session is final even for an in-gap
                  // straggler — the timeout already emitted it)
                  if (st.n > 0) closed += flush(user, st)
                  Some(OpenSession(st.sessionId + 1, tsMicros, 1L, e.event_id))
                case None =>
                  Some(OpenSession(1L, tsMicros, 1L, e.event_id))
              }
            }
            open.foreach { st =>
              state.update(st)
              if (st.n > 0) {
                // fire once the watermark proves no in-gap event can
                // arrive; clamp above the current watermark — Spark
                // rejects a timeout at/behind it, and a late-but-
                // delivered event can put lastTs + gap there
                val fireAt = st.lastTsMicros / 1000L + gapSeconds * 1000L
                state.setTimeoutTimestamp(
                  math.max(state.getCurrentWatermarkMs() + 1, fireAt))
              }
            }
            closed.result().iterator
          }
        })
  }
}
