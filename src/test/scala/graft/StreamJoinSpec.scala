package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJoin

case class Ev(user_id: Long, event_id: Long, ts: Timestamp)

/** Stream-stream interval join: the watermarked streaming execution must
  * agree with the batch execution of the SAME plan-building function, on
  * out-of-order input split across micro-batches. */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long) = new Timestamp(minute * 60L * 1000)

  test("streaming pairs == batch pairs on out-of-order cross-batch input") {
    implicit val sqlCtx = spark.sqlContext
    val purchases =
      Seq(Ev(1, 100, t(40)), Ev(1, 101, t(90)), Ev(2, 200, t(50)))
    val clicks = // user 1: two attributable to 100, one stale; user 2: one
      Seq(Ev(1, 1, t(15)), Ev(1, 2, t(35)), Ev(1, 3, t(9)), Ev(2, 4, t(30)))

    val batch = StreamJoin.pairs(purchases.toDF(), clicks.toDF())
      .as[(Long, Long, Long, Long)].collect().toSet

    val pStream = MemoryStream[Ev]
    val cStream = MemoryStream[Ev]
    val q = StreamJoin.pairs(pStream.toDF(), cStream.toDF())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib").start()
    try {
      // clicks arrive BEFORE their purchase, split across batches and
      // shuffled in time; the join must buffer and still emit every pair
      cStream.addData(Ev(1, 2, t(35)), Ev(2, 4, t(30)))
      q.processAllAvailable()
      pStream.addData(Ev(1, 100, t(40)), Ev(2, 200, t(50)))
      q.processAllAvailable()
      cStream.addData(Ev(1, 1, t(15)), Ev(1, 3, t(9))) // late-but-in-window
      pStream.addData(Ev(1, 101, t(90)))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM attrib")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
      // ground truth, by hand: 100←{15,35}; 200←{30}; 101 gets nothing
      // (15/35 are >30 min before t=90, click 9 before everything in range)
      assert(batch.map(p => (p._1, p._2)) ===
        Set((100L, 1L), (100L, 2L), (200L, 4L)))
      assert(batch.forall { case (_, _, _, lag) => lag >= 0 && lag <= 1800000000L })
    } finally q.stop()
  }

  test("batch key: pair count bounded and lags within the window at sf0.001") {
    val got = StreamJoin.streamIntervalJoin(spark, sf0001).cache()
    val n = got.count()
    assert(n > 0)
    assert(got.filter(col("lag_us") < 0 || col("lag_us") > 1800000000L).count() === 0)
    // every purchase_id in the output is a real purchase event
    val purchases = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id")).as[Long].collect().toSet
    assert(got.select(col("purchase_id")).as[Long].collect().forall(purchases))
    got.unpersist()
  }
}
