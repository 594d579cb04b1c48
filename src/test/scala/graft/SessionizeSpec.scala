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

  test("evicting sessionizer drops timed-out state and never collides ids") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Sessionize.TsEvent]
    // offset well past epoch 0: a row AT the initial watermark would be
    // dropped as late before any state is built
    def ev(u: Long, id: Long, min: Long) =
      Sessionize.TsEvent(u, id,
        new java.sql.Timestamp((1000 + min) * 60000L))
    val q = Sessionize.assignEvicting(
        stream.toDF().withWatermark("ts", "0 seconds"), gapUs = 30 * M)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("esessions").start()
    try {
      // batch 1: users 1 and 2 open sessions
      stream.addData(ev(1, 10, 0), ev(1, 11, 5), ev(2, 20, 0))
      q.processAllAvailable()
      // batch 2: user 2 keeps active, advancing the watermark far past
      // user 1's (last + gap) timeout → user 1's state must evict
      stream.addData(ev(2, 21, 200))
      q.processAllAvailable()
      stream.addData(ev(2, 22, 201))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators(0).numRowsTotal
      assert(after === 1L, s"state rows after timeout: $after")
      // user 1 returns: a FRESH session whose id is its own start µs —
      // no collision with the evicted session's id
      stream.addData(ev(1, 12, 300))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM esessions").as[SessionAssign]
        .collect().map(a => a.event_id -> a.session_id).toMap
      val base = 1000L * 60000000L
      assert(got(10L) === base && got(11L) === base)
      assert(got(12L) === base + 300L * 60000000L)
      assert(got(20L) === base)
      assert(got(21L) === base + 200L * 60000000L)
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
