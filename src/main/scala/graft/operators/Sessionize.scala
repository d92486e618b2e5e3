package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — an engine capability beyond the reference (it has no
  * window functions at all, SURVEY.md §2 "explicit absences"): group an
  * event stream into per-user sessions split by inactivity gaps.
  *
  * Batch: the classic gaps-and-islands form — `lag` to flag gap starts, a
  * running sum to number sessions. One shuffle (partition by user), sorts
  * within partitions only.
  *
  * Streaming: `flatMapGroupsWithState` with event-time timeout — the
  * KeyValueGroupedDataset custom-state path for semantics Spark's built-in
  * windows can't express (variable-length sessions).
  */
object Sessionize {

  /** Batch sessionization: (user_id, session_id, session_start,
    * session_end, n_events) per session, sessions split at gaps >
    * `gapMinutes`.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapSec = gapMinutes * 60L
    events
      .select(col("user_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
            > gapSec, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Streaming sessionization: emits a session once `gapMinutes` of event
    * time passes with no activity for the user (event-time timeout keyed
    * by watermark). Input must carry a watermark on `ts`.
    */
  def streamingSessions(events: Dataset[SessionEvent],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, new Timestamp(s.start),
          new Timestamp(s.end), s.n.toLong))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var out = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
            case Some(s) =>
              out ::= SessionOut(userId, new Timestamp(s.start),
                new Timestamp(s.end), s.n.toLong)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        out.reverseIterator
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
