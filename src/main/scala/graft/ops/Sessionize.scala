package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, tsSec: Long, value: Double)
final case class WatermarkedEvent(user_id: Long, tsSec: Long, value: Double,
    ts: java.sql.Timestamp)
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
    * emitted) when a new event arrives past the gap OR when the event-time
    * watermark passes `last + gap` — so idle users' final sessions drain
    * deterministically instead of being held (and leaked) forever.
    *
    * Event-time (NOT processing-time) timeouts are load-bearing twice over:
    * with processing-time timeouts registered Spark's
    * `shouldRunAnotherBatch` is permanently true, so the query spins empty
    * micro-batches forever (`processAllAvailable` never returns), and the
    * emitted output depends on wall clock. With event-time timeouts the
    * query re-batches only while the watermark advances, terminates, and
    * the output is a pure function of the input.
    *
    * Input: a streaming DataFrame with (user_id, ts TIMESTAMP, value);
    * `watermarkDelay` is the allowed event lateness.
    */
  def streaming(events: DataFrame, gapSec: Long = DefaultGapSec,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      // keep the watermarked ts column through the grouping: projecting it
      // away detaches the watermark and Spark rejects EventTimeTimeout
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"),
        col("value"), col("ts"))
      .as[WatermarkedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it0: Iterator[WatermarkedEvent], state: GroupState[SessState]) =>
          val it = it0.map(w => SessionEvent(w.user_id, w.tsSec, w.value))
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new input: close + clear
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
            // fire when the watermark passes the session gap; timeout must be
            // strictly above the current watermark (late-arriving groups)
            state.setTimeoutTimestamp(math.max((st.last + gapSec) * 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

}
