package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit keyed state
  * (`flatMapGroupsWithState`) — the incremental form of
  * [[graft.operators.AdvancedOps.sessionize]]'s batch window query.
  *
  * State per user is O(1): (current session id, last-seen µs). That bound
  * is what makes the operator viable on an unbounded 100 TB/day stream —
  * the batch window form needs the full per-user history in one sort,
  * the streaming form carries two longs per key across micro-batches.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, event_id: Long, us: Long)
  final case class SessionState(sessionId: Long, lastUs: Long)
  final case class SessionAssign(user_id: Long, session_id: Long, event_id: Long)

  /** Assign a session id to every event; sessions break after `gapUs` of
    * per-user inactivity. Works identically on batch and streaming
    * Datasets (batch = one big group invocation with empty initial state). */
  def assign(events: Dataset[SessionEvent], gapUs: Long): Dataset[SessionAssign] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionAssign]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // events within a micro-batch arrive unordered; order them here.
          // Cross-batch order is the stream's responsibility (or use
          // event-time + watermark and tolerate gap merges).
          val sorted = it.toIndexedSeq.sortBy(e => (e.us, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = sorted.map { e =>
            val isNew = st.lastUs == Long.MinValue || e.us - st.lastUs > gapUs
            st = SessionState(if (isNew) st.sessionId + 1 else st.sessionId, e.us)
            SessionAssign(user, st.sessionId, e.event_id)
          }
          state.update(st)
          out.iterator
      }
  }
}
