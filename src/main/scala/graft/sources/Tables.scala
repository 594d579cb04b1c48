package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's test tables (`/root/testdata/<sf>/<name>.parquet`).
  *
  * The reference's durable store is a MongoDB collection scanned in full on
  * every dashboard refresh (`/root/reference/app.py:32-36`); our store is
  * columnar parquet, so Catalyst's column pruning and predicate pushdown
  * reach the scan (`PushedFilters` / `ReadSchema` in `.explain`). At 100 TB
  * the same loaders work against a partitioned parquet/iceberg layout —
  * nothing here assumes a single file.
  */
object Tables {
  private def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `events.ts` is nanosecond-precision parquet (TESTDATA.md), which Spark's
    * TimestampType (µs) cannot hold: the vectorized reader rejects
    * `TIMESTAMP(NANOS)` outright. We read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs ourselves —
    * `ts div 1000` in integer arithmetic (a double division would lose
    * precision above 2^53 ns ≈ 1970+104 days). Every downstream comparison
    * against the DuckDB oracle (which keeps full ns) is designed for this
    * truncation: half-open range predicates, second-level formatted output. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRawNanos(spark, dir)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Events with `ts` as the raw nanosecond epoch long. Predicates that can
    * be expressed on the raw long (time ranges at coarse boundaries) should
    * filter HERE, before the µs conversion — a filter on the converted
    * column sits above a projection and never reaches the parquet scan,
    * while a long comparison is pushed down and skips row groups. */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
