package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout utilities — the write-side half of the 100 TB story.
  *
  * The reference's store is one unindexed MongoDB collection rescanned in
  * full every 5 minutes (`/root/reference/app.py:32-36,101`). At scale the
  * layout IS the index: date-partitioned parquet turns every time-ranged
  * query (range_filter, sessionize, the dashboard window) into a scan of
  * only the matching day directories (Catalyst `PartitionFilters`), and
  * sorting within files by the frequent filter key tightens row-group
  * min/max bounds for pushdown.
  */
object Layout {

  /** Write events day-partitioned and sorted by (event_type, ts) within
    * each file. `repartition` by the partition column keeps one writer task
    * per day (no small-file explosion — the classic partitionBy footgun). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .repartition(col("day"))
      // the writer REQUIRES ordering to start with the partition column;
      // leading with (event_type, ts) alone would make Spark insert its own
      // day-sort on top, wasting the first sort and leaving the within-file
      // order to unguaranteed stability
      .sortWithinPartitions(col("day"), col("event_type"), col("ts"))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(path)

  /** Read a day-partitioned events store; `filter(col("day") === ...)`
    * prunes directories before any IO (verify via explain:
    * "PartitionFilters"). */
  def readEventsByDay(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
