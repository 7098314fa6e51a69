package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, tsSec: Long, value: Double)
final case class SessionOut(user_id: Long, sid: Long, n_events: Long,
    duration_sec: Long)

/** Gap-based sessionization — the canonical stateful streaming operator.
  *
  * Batch form: `groupByKey(user).flatMapGroups` with an in-group sort and a
  * single gap pass — shuffles once on user_id, never materializes a window
  * over the whole table (no global `Window.orderBy`), so it scales with
  * users x events-per-user. Streaming form: `flatMapGroupsWithState` with
  * event-time timeout, emitting a session when the gap (or watermark
  * timeout) closes it — the micro-batch analogue of the reference's
  * flush-on-threshold ingest loop.
  */
object Sessionize {
  val DefaultGapSec = 1800L

  /** Batch sessionization. Input needs (user_id LONG, ts TIMESTAMP, value
    * DOUBLE); emits (user_id, sid, n_events, duration_sec) where sid is the
    * 1-based session index per user in time order.
    */
  def batch(df: DataFrame, gapSec: Long = DefaultGapSec): Dataset[SessionOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id").cast("long"),
        unix_timestamp(col("ts").cast("timestamp")).as("tsSec"),
        col("value").cast("double"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SessionEvent]) =>
        val evs = it.toArray.sortBy(_.tsSec)
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var sid = 0L
        var start = 0L
        var last = Long.MinValue
        var n = 0L
        evs.foreach { e =>
          if (last == Long.MinValue || e.tsSec - last > gapSec) {
            if (n > 0) out += SessionOut(uid, sid, n, last - start)
            sid += 1
            start = e.tsSec
            n = 0L
          }
          last = e.tsSec
          n += 1
        }
        if (n > 0) out += SessionOut(uid, sid, n, last - start)
        out.iterator
      }
  }

  case class SessState(sid: Long, start: Long, last: Long, n: Long)

  /** Streaming sessionization: state per user; a session closes (and is
    * emitted) when a new event arrives past the gap OR when the
    * processing-time timeout fires with no new events — so idle users'
    * final sessions drain instead of being held (and leaked) forever.
    */
  def streaming(events: Dataset[SessionEvent], gapSec: Long = DefaultGapSec)
      : Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // gap elapsed with no new input: close + clear
            val st = state.get
            state.remove()
            if (st.n > 0) Iterator.single(SessionOut(uid, st.sid, st.n, st.last - st.start))
            else Iterator.empty
          } else {
            // micro-batch arrival order is not time order: sort batch locally
            val evs = it.toArray.sortBy(_.tsSec)
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue, 0L))
            evs.foreach { e =>
              if (st.last == Long.MinValue || e.tsSec - st.last > gapSec) {
                if (st.n > 0) out += SessionOut(uid, st.sid, st.n, st.last - st.start)
                st = SessState(st.sid + 1, e.tsSec, e.tsSec, 1L)
              } else {
                st = st.copy(last = math.max(st.last, e.tsSec), n = st.n + 1)
              }
            }
            state.update(st)
            state.setTimeoutDuration(gapSec * 1000L)
            out.iterator
          }
      }
  }

}
