package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming heavy hitters: per-event-time-window frequent tokens over an
  * unbounded token stream — "what's trending" (SURVEY §2.8 stateful
  * extension, reusing [[graft.functions.MisraGriesAgg]]).
  *
  * The state story is the point: a naive `groupBy(window, token).count()`
  * keeps one state row PER DISTINCT TOKEN per open window — unbounded in
  * the vocabulary, exactly what kills a stream over live text. The
  * Misra-Gries aggregate caps each window's state at `capacity` counters
  * with the standard guarantee (any token above the N/(capacity+1)
  * frequency line survives), and because it's a TypedImperativeAggregate
  * the micro-batch path partially aggregates map-side before touching the
  * state store. The watermark bounds the number of OPEN windows, so total
  * state ≤ open_windows × capacity, a constant — at any stream rate.
  */
object Trending {

  /** Frequent tokens per tumbling window. `tokens` needs an event-time
    * `ts` column and a string `token` column. Emits one row per
    * (window, surviving token), count-descending rank within window. */
  def trendingTokens(tokens: DataFrame, windowLen: String = "5 minutes",
      lateness: String = "10 minutes", capacity: Int = 64): DataFrame =
    tokens.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.MisraGriesAgg(col("token"), capacity).as("hh"))
      .select(col("window.start").as("win_start"), explode(col("hh")).as("s"))
      .select(col("win_start"), col("s.term").as("term"), col("s.cnt").as("cnt"))
}
