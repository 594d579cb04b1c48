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

  /** Schema cache, keyed by the store's DATA-FILE listing (count, max
    * mtime, total bytes over the non-hidden files inside a directory
    * store; the file's own stat for a single-file store) so a rewritten
    * store is re-inferred. Keying on the DIRECTORY stat alone is wrong
    * for Spark-written parquet: dir mtime moves only when direct entries
    * are created/renamed/deleted and dir length() is not content size, so
    * an in-place rewrite of identically-named part files would serve a
    * stale schema. On a cluster the catalog (metastore/iceberg) serves
    * the schema and the per-query footer-inference read never happens; a
    * bare `spark.read.parquet(path)` re-lists and re-infers on EVERY
    * DataFrame construction, which profiled at 0.1-0.2 s of driver time
    * per query — a fixed tax on all 455 bench keys. Caching the inferred
    * schema and passing it explicitly restores catalog-like behavior
    * without changing any result: the cached schema IS what inference
    * produced under the session's parquet confs, and the listing stamp
    * invalidates on any rewrite. Non-local paths (hdfs://, s3://) fail
    * the java.io.File existence probe and fall through to the plain
    * uncached read — graceful degradation; on a real cluster the catalog
    * owns the schema and this cache is not the mechanism. Bounded: the
    * key space is (test dirs × tables × rewrites), tiny by construction,
    * but a defensive clear at 1024 entries stops unbounded growth if a
    * caller loops over generated stores. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, Long),
      org.apache.spark.sql.types.StructType]()
  private val SchemaCacheMaxEntries = 1024

  /** (n_files, max mtime, total bytes) over a store's data files —
    * the listing stamp that changes whenever any part file is added,
    * removed, or rewritten in place (mtime moves even when the name and
    * byte count don't). Hidden/metadata entries (`_SUCCESS`, `.crc`) are
    * excluded so a metadata-only touch doesn't churn the cache. */
  private def listingStamp(f: java.io.File): (Long, Long, Long) =
    if (f.isFile) (1L, f.lastModified(), f.length())
    else {
      val files = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(c => c.isFile && !c.getName.startsWith("_") &&
          !c.getName.startsWith("."))
      if (files.isEmpty) (0L, f.lastModified(), 0L)
      else (files.length.toLong, files.map(_.lastModified()).max,
        files.map(_.length()).sum)
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = path(dir, name)
    val f = new java.io.File(p)
    if (!f.exists()) spark.read.parquet(p)
    else {
      val (n, mt, sz) = listingStamp(f)
      val key = (p, n, mt, sz)
      var s = schemaCache.get(key)
      if (s == null) {
        s = spark.read.parquet(p).schema
        if (schemaCache.size() >= SchemaCacheMaxEntries) schemaCache.clear()
        schemaCache.put(key, s)
      }
      spark.read.schema(s).parquet(p)
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `events.ts` arrives in either of two parquet encodings depending on
    * the generator vintage: µs `TimestampType` (current testdata), or
    * `TIMESTAMP(NANOS)`, which Spark's TimestampType (µs) cannot hold —
    * the vectorized reader rejects it outright, so that vintage is read
    * as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and truncated
    * to µs ourselves: `ts div 1000` in integer arithmetic (a double
    * division would lose precision above 2^53 ns ≈ 1970+104 days). The
    * loader sniffs the footer schema and normalizes BOTH to µs
    * TimestampType, so every operator sees one shape; ns→µs truncation is
    * oracle-safe by the repo discipline of half-open range predicates and
    * second-level formatted output. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // harmless when the file is µs-encoded; required to open a ns file
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs files are written isAdjustedToUTC=false; inferred as NTZ they
    // break every unix_micros/time-zone-aware consumer, so read them as
    // plain TimestampType — with the repo-wide UTC session the wall
    // values mean the same instants (and the same rows the DuckDB
    // oracle's naive timestamps select)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    table(spark, dir, "events")
  }

  /** Events with `ts` as the raw nanosecond epoch long, whatever the disk
    * encoding. On ns-encoded data the long IS the stored column, so
    * coarse-boundary range predicates placed here push into the parquet
    * scan (row-group skipping); on µs-encoded data the long is a derived
    * `unix_micros·1000` (exact — µs·1000 cannot overflow before year
    * ~294247) and no longer scan-pushable, so operators that want
    * pushdown on modern files should instead filter [[events]]' timestamp
    * column with timestamp literals. */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")) * 1000L)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
