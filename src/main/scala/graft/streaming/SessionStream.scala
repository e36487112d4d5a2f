package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the `flatMapGroupsWithState` twin of
  * the batch `sessionize` operator (gap-based, 30 min default). Each user's
  * open session lives in group state; an event arriving after the gap
  * closes the previous session and emits it downstream.
  *
  * This is the engine's template for custom streaming state beyond windowed
  * aggregation (cassabon's accumulate loop generalized to arbitrary
  * per-key state machines).
  */
object SessionStream {

  case class SessEvent(user_id: Long, ts_sec: Long, event_id: Long)
  case class OpenSession(seq: Long, start: Long, end: Long, n: Long)
  case class ClosedSession(user_id: Long, session_seq: Long,
      session_start: Long, session_end: Long, n_events: Long)

  def sessionize(events: Dataset[SessEvent], gapSec: Long): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessEvent]
    implicit val so = Encoders.product[OpenSession]
    implicit val sc = Encoders.product[ClosedSession]
    implicit val kl = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[SessEvent], state: GroupState[OpenSession]) => {
          val ordered = batch.toSeq.sortBy(e => (e.ts_sec, e.event_id))
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          ordered.foreach { e =>
            open match {
              case Some(s) if e.ts_sec - s.end > gapSec =>
                closed += ClosedSession(userId, s.seq, s.start, s.end, s.n)
                open = Some(OpenSession(s.seq + 1, e.ts_sec, e.ts_sec, 1))
              case Some(s) =>
                open = Some(s.copy(end = math.max(s.end, e.ts_sec), n = s.n + 1))
              case None =>
                open = Some(OpenSession(1, e.ts_sec, e.ts_sec, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
        })
  }
}
