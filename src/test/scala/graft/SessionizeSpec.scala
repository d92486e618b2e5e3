package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, "2024-01-01 10:00:00"),
    (1L, "2024-01-01 10:10:00"), // same session (10 min gap)
    (1L, "2024-01-01 11:30:00"), // new session (80 min gap)
    (2L, "2024-01-01 10:00:00")) // other user
    .toDF("user_id", "tstr")
    .select($"user_id", to_timestamp($"tstr").as("ts"))

  test("batch sessionization splits on inactivity gaps") {
    val got = Sessionize.sessions(events, gapMinutes = 30)
      .orderBy($"user_id", $"session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
        r.getTimestamp(3).toString, r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L),
      (1L, 2L, "2024-01-01 11:30:00.0", "2024-01-01 11:30:00.0", 1L),
      (2L, 1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1L)))
  }

  test("streaming sessionization with event-time timeout matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sess").toString
    val input = MemoryStream[Sessionize.SessionEvent]
    val sessions = Sessionize.streamingSessions(
      input.toDS().withWatermark("ts", "10 minutes")
        .as[Sessionize.SessionEvent],
      gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    input.addData(
      Sessionize.SessionEvent(1L, t("2024-01-01 10:00:00")),
      Sessionize.SessionEvent(1L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // advance the watermark far past the session gap → timeout fires
    input.addData(Sessionize.SessionEvent(9L, t("2024-01-01 13:00:00")))
    q.processAllAvailable()
    input.addData(Sessionize.SessionEvent(9L, t("2024-01-01 16:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_out")
      .where($"user_id" === 1L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L)))
  }
}
