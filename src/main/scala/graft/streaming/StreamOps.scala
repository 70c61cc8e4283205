package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming transforms over event streams: watermarked
  * tumbling-window aggregation and custom keyed state via
  * flatMapGroupsWithState — the streaming checklist items of SURVEY.md
  * §2.7 (absent in the reference; batch equivalents are oracle-checked
  * in GateOps.eventsHourly / eventsSessions). */
object StreamOps {

  /** Tumbling 1-hour counts/sums per event_type with a 2-hour watermark.
    * Works on both streaming and batch DataFrames (same plan). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("h_epoch"),
        col("event_type"), col("cnt"), col("sum_value"))

  final case class SessionState(lastTs: Long, sessions: Long, events: Long)
  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization (30-min gap) with flatMapGroupsWithState —
    * emits the running per-user session count after each batch. Event-time
    * ordering within a batch is restored by sorting the batch group (the
    * streaming analog of the batch lag() window in GateOps.eventsSessions). */
  def sessionize(events: Dataset[(Long, Long)] /* (user_id, epochSec) */ ):
      Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val ts = rows.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          ts.foreach { t =>
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > 1800
            st = SessionState(t, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(SessionUpdate(user, st.sessions, st.events))
      }
  }
}
