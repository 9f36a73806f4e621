package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — the canonical event-pipeline gold op.
  *
  * Batch form: gap-based sessions with window functions (one shuffle on
  * the user key; sessions are a running count of gap-breaks). Streaming
  * form: the same semantics as explicit state with
  * flatMapGroupsWithState (SURVEY guide's custom-state row).
  */
object Sessionize {

  /** Batch: assign `session_seq` (1-based per user) and per-session
    * aggregates. A new session starts when the gap to the previous event
    * exceeds `gapMinutes`.
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int = 30): DataFrame = {
    // event_id is only a DETERMINISM tiebreaker for equal timestamps
    // (ties have gap 0 and land in the same session either way) — don't
    // require it of frames that lack the column
    val tiebreak =
      if (events.columns.contains("event_id")) Seq(col("event_id"))
      else Seq.empty
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tiebreak: _*)
    val tagged = events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col(tsCol).cast("long") - col("__prev_ts").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    tagged
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  final case class SessionState(start: Long, last: Long, n: Long)

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Streaming: explicit state per user; a session is emitted when the
    * state times out `gapMinutes` after the last event (event-time
    * watermark drives the timeout).
    */
  def streamingSessions(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          val gapMs = gapMinutes * 60000L
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            val ts = rows.map(_._2.getTime).toSeq.sorted
            var out = List.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.reverseIterator
          }
      }
  }
}
