package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — gap-based session windows per key.
  *
  * Batch shape: the classic lag/cumsum formulation — a new session
  * starts when the gap to the previous event exceeds `gapSeconds`;
  * session id = running count of session starts per key. One shuffle on
  * the key; window functions do the rest (no UDFs).
  *
  * Streaming shape: `flatMapGroupsWithState` with event-time timeout —
  * the custom-state path (SURVEY.md steering: KeyValueGroupedDataset
  * state ops) emitting a session row when the gap timeout fires.
  */
object Sessionize {

  /** Batch sessionization: adds `session_id` (1-based per key) to each
    * event. Deterministic under (tsCol, tieBreak) total order. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val gap = col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
    val isStart = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Batch session summary: one row per (key, session) with bounds and
    * size. */
  def sessionSummary(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame =
    assignSessions(df, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  // ---- streaming -----------------------------------------------------------

  case class Event(userId: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(userId: Long, sessionStart: Timestamp,
    sessionEnd: Timestamp, nEvents: Long)

  /** Streaming sessionization over a stream of (userId, ts): closes and
    * emits a session when the event-time gap exceeds `gapSeconds`
    * (sessions still open at watermark+timeout emit on timeout). */
  def streamingSessions(events: Dataset[Event], gapSeconds: Long)
      : Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]

    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val out = collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          if (state.hasTimedOut) {
            cur.foreach(s => out += SessionOut(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n))
            state.remove()
            cur = None
          }
          for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapSeconds * 1000 =>
                cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case Some(s) =>
                out += SessionOut(userId, new Timestamp(s.start),
                  new Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
          }
          out.iterator
      }
  }
}
