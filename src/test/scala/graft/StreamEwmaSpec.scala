package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamEwma
import graft.streaming.StreamEwma.EwmaEvent

/** The O(1)-state streaming EWMA recurrence must converge to the batch
  * closed form — on multi-batch input with within-batch disorder — and the
  * batch key itself must satisfy the recurrence computed by hand.
  */
class StreamEwmaSpec extends SparkSuite {
  import spark.implicits._

  private def refEwma(xs: Seq[Double]): Double =
    xs.tail.foldLeft(xs.head)((e, x) => 0.9 * e + 0.1 * x)

  test("streaming recurrence state == hand recurrence across micro-batches " +
    "with within-batch disorder") {
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[EwmaEvent]
    val q = StreamEwma.running(s.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ewma_run").start()
    try {
      // user 7: values 10, 20, 30, 40 in event-time order — but batch 1
      // delivers (20, 10) out of order; user 8: single value
      s.addData(EwmaEvent(7, 2, 2000, 20.0), EwmaEvent(7, 1, 1000, 10.0),
        EwmaEvent(8, 10, 1000, 5.0))
      q.processAllAvailable()
      s.addData(EwmaEvent(7, 3, 3000, 30.0), EwmaEvent(7, 4, 4000, 40.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT user_id, n_events, ewma FROM ewma_run")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(7L)._2 == 4L)
      assert(math.abs(last(7L)._3 - refEwma(Seq(10, 20, 30, 40))) < 1e-9)
      assert(last(8L)._2 == 1L)
      assert(last(8L)._3 == 5.0)
    } finally q.stop()
  }

  test("batch closed form == recurrence on the real table (sf0.001)") {
    val batch = StreamEwma.streamEwmaFinal(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val raw = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "value")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    raw.foreach { case (u, rows) =>
      val xs = rows.sortBy(r => (r._3, r._2)).map(_._4).toSeq
      val (n, e) = batch(u)
      assert(n == xs.length)
      assert(math.abs(e - refEwma(xs)) < 1e-5) // closed form vs recurrence
    }
  }
}
