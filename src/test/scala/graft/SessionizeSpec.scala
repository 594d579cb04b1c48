package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.AdvancedOps
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{SessionAssign, SessionEvent}

/** Sessionization: streaming state machine ≡ batch window query. */
class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private val M = 60L * 1000000 // one minute in µs

  test("gap splitting, cross-batch state, per-user isolation") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.assign(stream.toDS(), gapUs = 30 * M)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions").start()
    try {
      // batch 1: user 1 two close events; user 2 one event
      stream.addData(SessionEvent(1, 10, 0), SessionEvent(1, 11, 5 * M),
        SessionEvent(2, 20, 0))
      q.processAllAvailable()
      // batch 2: user 1 returns after 31 min (new session) then again close;
      // user 2 returns within the gap (same session)
      stream.addData(SessionEvent(1, 12, 36 * M), SessionEvent(1, 13, 40 * M),
        SessionEvent(2, 21, 25 * M))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sessions").as[SessionAssign]
        .collect().map(a => a.event_id -> a.session_id).toMap
      assert(got === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L,
        20L -> 1L, 21L -> 1L))
    } finally q.stop()
  }

  test("streaming state machine agrees with the batch window form on sf0.001") {
    val batch = AdvancedOps.sessionize(spark, sf0001)
      .select($"user_id", $"session_id", $"n_events")
      .as[(Long, Long, Long)].collect()
      .map { case (u, s, n) => (u, s) -> n }.toMap
    val events = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .as[SessionEvent]
    val streamed = Sessionize.assign(events, gapUs = 30 * M)
      .groupByKey(a => (a.user_id, a.session_id)).count()
      .collect().toMap
    assert(streamed === batch)
  }
}
