package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Structured-Streaming port of the reference's ingest chain
  * (`/root/reference/producer.py` → Kafka → `/root/reference/consumer.py` →
  * MongoDB), re-expressed as ONE streaming query: source → flatten →
  * validate → derive → sink (SURVEY.md §3.1).
  *
  * Every transform is a pure plan function over a DataFrame, so the SAME
  * code runs in batch (unit tests, backfills) and streaming — the idiomatic
  * Spark upgrade from the reference's imperative per-message loop
  * (`consumer.py:29-78`). Delivery upgrades from the reference's
  * at-least-once (auto-commit + blind insert_one, `consumer.py:22,78`) to
  * exactly-once via checkpoint + idempotent parquet sink.
  *
  * In this offline environment the Kafka source/sink are stood in by
  * MemoryStream (tests) / file sources — the plan from `from_json` onward
  * is identical to `readStream.format("kafka")`'s `value` column.
  */
object IngestPipeline {

  /** Raw OpenWeatherMap payload shape (FIXTURES.md A1; producer sends the
    * API response unmodified, `producer.py:38-41`). `weather` is declared
    * StringType and parsed explicitly: the reference defends against the
    * field arriving either as a JSON array or as a stringified-JSON value
    * (`consumer.py:36-45`), and a typed from_json would silently null the
    * whole struct on shape drift. */
  val weatherElem: ArrayType = ArrayType(StructType(Seq(
    StructField("description", StringType))))

  val rawSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("humidity", LongType),
      StructField("pressure", LongType)))),
    StructField("weather", StringType), // re-parsed below (string-or-array)
    StructField("wind", StructType(Seq(StructField("speed", DoubleType)))),
    StructField("coord", StructType(Seq(
      StructField("lon", DoubleType), StructField("lat", DoubleType)))),
    StructField("dt", LongType),
    StructField("timezone", LongType)))

  /** The ONE store projection (consumer.py:32-53), shared by [[flatten]]
    * and [[flattenFlagged]] so the ingest schema mapping lives in exactly
    * one place — the two paths can't silently drift. */
  private val storeProjection: Seq[Column] = Seq(
    col("p.name").as("city"),
    col("p.main.temp").as("temperature"),
    col("p.main.humidity").cast("int").as("humidity"),
    col("p.main.pressure").cast("int").as("pressure"),
    // consumer.py:36-45: weather may be an array OR a stringified JSON
    // array; either way take [0].description, default "Unknown"
    coalesce(
      from_json(col("p.weather"), weatherElem).getItem(0).getField("description"),
      lit("Unknown")).as("weather"),
    col("p.wind.speed").as("wind_speed"),
    col("p.coord").as("coordinates"),
    col("p.dt").as("dt"),
    col("p.timezone").as("tz_offset"))

  /** consumer.py:32-53 — flatten the nested payload into the store schema.
    * `json` is a column of raw JSON strings (Kafka `value`). */
  def flatten(raw: DataFrame, json: Column): DataFrame =
    raw.withColumn("p", from_json(json, rawSchema))
      .select(storeProjection: _*)

  /** producer.py:37-44's try/except, declarative (SURVEY §2.8 maps it to
    * "PERMISSIVE + `_corrupt_record`"): parse with a corrupt-record column
    * so a payload that fails to parse AT ALL keeps its raw text instead of
    * silently vanishing. Shape drift INSIDE a parseable payload still
    * degrades per-field (nulls → [[validated]] drop), matching
    * consumer.py:55-57; only unparseable input is quarantined. */
  val quarantineSchema: StructType =
    rawSchema.add(StructField("_corrupt_record", StringType))

  /** [[flatten]] + a `_corrupt_record` column (null ⇔ payload parsed). */
  def flattenFlagged(raw: DataFrame, json: Column): DataFrame =
    raw.withColumn("p", from_json(json, quarantineSchema,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .select(storeProjection :+
        col("p._corrupt_record").as("_corrupt_record"): _*)

  /** The quarantine side output: raw text of every unparseable payload. */
  def quarantine(flagged: DataFrame): DataFrame =
    flagged.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_payload"))

  /** Clean/quarantine split over ONE parse: (validated ingest rows,
    * quarantined raw payloads). Both sides derive from the same flagged
    * plan, so in foreachBatch the parse runs once per micro-batch. */
  def ingestWithQuarantine(raw: DataFrame, json: Column)
      : (DataFrame, DataFrame) = {
    val flagged = flattenFlagged(raw, json)
    val clean = flagged.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    (withLocalTime(validated(clean)), quarantine(flagged))
  }

  /** consumer.py:55-57 — drop incomplete records ("Data tidak lengkap"). */
  def validated(flat: DataFrame): DataFrame =
    flat.filter(col("temperature").isNotNull && col("humidity").isNotNull &&
      col("dt").isNotNull)

  /** consumer.py:59-61 — local wall-clock = UTC epoch + offset seconds,
    * stored formatted (the reference stores a string; we keep the typed
    * timestamp alongside). */
  def withLocalTime(df: DataFrame): DataFrame =
    df.withColumn("obs_ts", timestamp_seconds(col("dt")))
      .withColumn("local_time",
        date_format(timestamp_seconds(col("dt") + col("tz_offset")),
          "yyyy-MM-dd HH:mm:ss"))

  /** The full ingest plan: raw JSON strings → validated flat records. */
  def ingest(raw: DataFrame, json: Column): DataFrame =
    withLocalTime(validated(flatten(raw, json)))

  /** Streaming dedup of redelivered records: the reference's pipeline is
    * at-least-once (auto-commit consumer + blind insert_one,
    * `consumer.py:22,78`) so replays DUPLICATE rows in MongoDB; this stage
    * drops them by natural key (city, dt) with state bounded by the
    * watermark — `dropDuplicatesWithinWatermark` evicts seen-keys older
    * than the 10-minute horizon, so state is O(keys per horizon), not
    * O(stream). The at-scale-correct streaming dedup (an unbounded
    * dropDuplicates would OOM a year-long stream). */
  def dedupedStream(obs: DataFrame): DataFrame =
    obs.withWatermark("obs_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("city", "dt")

  /** Stream-static enrichment join (J1 in streaming form): each arriving
    * observation picks up its island from the 16-row dimension. The static
    * side broadcasts; no stream-side state at all — the join is stateless
    * per micro-batch, the same plan a 1000-executor cluster runs. */
  def enriched(obs: DataFrame, islandDim: DataFrame): DataFrame =
    obs.join(broadcast(islandDim), Seq("city"), "left")
      .withColumn("pulau", coalesce(col("pulau"), lit("Lainnya")))

  /** FIXTURES.md A3 — the app.py:15-23 island dimension as a DataFrame. */
  def islandDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      "Medan" -> "Sumatera", "Padang" -> "Sumatera", "Palembang" -> "Sumatera",
      "Jakarta" -> "Jawa", "Bandung" -> "Jawa", "Surabaya" -> "Jawa",
      "Pontianak" -> "Kalimantan", "Banjarmasin" -> "Kalimantan",
      "Samarinda" -> "Kalimantan",
      "Makassar" -> "Sulawesi", "Manado" -> "Sulawesi", "Palu" -> "Sulawesi",
      "Jayapura" -> "Papua",
      "Denpasar" -> "Bali-Nusa", "Mataram" -> "Bali-Nusa",
      "Ambon" -> "Maluku",
    ).toDF("city", "pulau")
  }

  /** Sliding-window variant of [[tumblingAvg]]: 10-minute windows sliding
    * every 5 — each event lands in 2 windows (window/slide overlap factor
    * bounds the state and row amplification). */
  def slidingAvg(obs: DataFrame): DataFrame =
    obs.withWatermark("obs_ts", "10 minutes")
      .groupBy(window(col("obs_ts"), "10 minutes", "5 minutes"), col("city"))
      .agg(avg(col("temperature")).as("avg_temp"), count(lit(1)).as("n_obs"))
      .select(col("window.start").as("win_start"), col("city"),
        col("avg_temp"), col("n_obs"))

  /** Number of stable hash buckets the upsert store is partitioned into.
    * Small here (16 cities); at scale it is sized so a bucket's parquet
    * fits one task's rewrite budget (e.g. 4096 buckets for a 1 TB store). */
  val StoreBuckets = 16

  /** Stable store-partition of a city — pure function of the key, so a
    * city's rows land in the same bucket in every batch forever. */
  def bucketOf(city: Column): Column =
    pmod(xxhash64(city), lit(StoreBuckets)).cast("int")

  /** foreachBatch UPSERT sink: the store keeps ONE row per city — the
    * latest observation — instead of the reference's append-only
    * insert_one pile (`consumer.py:78`, which accumulates every poll
    * forever and makes the dashboard re-aggregate history it doesn't
    * want).
    *
    * INCREMENTAL: the store is laid out as `bucket=N` subdirectories keyed
    * by [[bucketOf]], and a micro-batch rewrites ONLY the buckets its rows
    * hash into — O(batch), not O(store). (The previous form re-read and
    * rewrote the whole store every batch: correct, but a scale-killer once
    * the store dwarfs a micro-batch.) Each touched bucket does the
    * read-union-dedupe-swap against its own directory with the two-rename
    * crash-safety preserved PER BUCKET; untouched buckets are not opened,
    * so their files stay byte-identical (pinned by IngestPipelineSpec).
    * The window order is a TOTAL order over the stored columns:
    * redelivered duplicates (same city+dt, possibly corrected values)
    * resolve identically on every run. AT SCALE the same foreachBatch
    * body targets a table format's MERGE (Delta/Iceberg) — this bucket
    * layout is exactly the file-pruning that MERGE buys, hand-rolled on
    * plain parquet. */
  def upsertBatch(batch: DataFrame, store: String): Unit = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    recoverBuckets(fs, store)
    // persisted for the batch's lifetime: this function runs 1 + |touched
    // buckets| actions over the micro-batch, and an UNcached batch frame
    // re-reads the SOURCE per action — IngestPipelineSpec's wire test
    // caught the source being read 4× per epoch via numInputRows, which
    // against a real broker is 4 fetches of the same offsets. The collect
    // below materializes the cache before the per-bucket consumers run
    // (cache-then-action, so no cold-cache race), and the unpersist is
    // safe because every action completes inside this call.
    val slim = batch.select("city", "temperature", "humidity", "dt")
      .withColumn("bucket", bucketOf(col("city")))
      .persist()
    try {
      // ≤ StoreBuckets ids — bounded by construction (bucketOf is
      // pmod(hash, StoreBuckets)), and ENFORCED: a refactor that widens
      // bucketOf without revisiting this driver-side loop must fail here,
      // not OOM the driver. limit(+1) bounds the collect itself, so even
      // the failing path never materializes an unbounded id set.
      val touched = slim.select("bucket").distinct()
        .limit(StoreBuckets + 1)
        .collect().map(_.getInt(0)).sorted
      require(touched.length <= StoreBuckets,
        s"upsertBatch: > $StoreBuckets distinct bucket ids — bucketOf no " +
          "longer matches the StoreBuckets driver-side bound")
      touched.foreach { b =>
        mergeSwapBucket(slim.filter(col("bucket") === b).drop("bucket"),
          fs, s"$store/bucket=$b", s"$store.tmp/bucket=$b",
          s"$store.bak/bucket=$b")
      }
    } finally slim.unpersist()
  }

  /** Restore any bucket whose previous batch died between its two renames:
    * the swap keeps a bucket's previous data in exactly one of
    * {store/bucket=N, store.bak/bucket=N} at every instant, so a missing
    * store-side dir with a surviving .bak twin is restored before anything
    * reads the store. Runs over ALL buckets (one listing), not just the
    * batch's — a crashed bucket must not stay invisible until its city
    * happens to recur. */
  private def recoverBuckets(fs: org.apache.hadoop.fs.FileSystem,
      store: String): Unit = recoverDirs(fs, store, "bucket=")

  /** The all-partitions sweep shared by the bucket and day stores: any
    * `<prefix>X` dir stranded ONLY in `.bak` (crash between the two
    * renames) is restored before anything reads or writes the store —
    * including partitions no later batch will ever touch again. */
  private def recoverDirs(fs: org.apache.hadoop.fs.FileSystem,
      store: String, prefix: String): Unit = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val bakRoot = p(store + ".bak")
    if (fs.exists(bakRoot)) {
      fs.mkdirs(p(store))
      fs.listStatus(bakRoot).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(prefix) && !fs.exists(p(s"$store/$name")))
          require(fs.rename(st.getPath, p(s"$store/$name")),
            s"partition recovery rename $name failed")
      }
    }
  }

  /** The two-rename crash-safe swap shared by the bucket store, the day
    * stores, and [[compactStore]]: `tmp` (fully written) replaces `dir`,
    * with the previous `dir` parked in `bak` for exactly the window
    * between the two renames — so at every instant the partition's
    * previous data exists in exactly one of {dir, bak} and
    * [[recoverDirs]] can always restore it. Every rename result is
    * CHECKED (a false return — cross-filesystem tmp, permissions — must
    * fail the batch, not silently drop data). */
  private def swapDir(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, tmp: String, bak: String): Unit = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def mv(from: String, to: String): Unit =
      require(fs.rename(p(from), p(to)), s"rename $from -> $to failed")
    fs.delete(p(bak), true)
    fs.mkdirs(p(bak).getParent)
    fs.mkdirs(p(dir).getParent)
    if (fs.exists(p(dir))) mv(dir, bak)
    mv(tmp, dir)
    fs.delete(p(bak), true)
  }

  /** Read-union-dedupe-write-swap for ONE bucket directory. The bucket
    * path is never read and written by the same job (the merge writes to
    * `tmp`), so a lost cache block can never recompute against a
    * half-truncated store; foreachBatch retries idempotently because the
    * merge is deterministic over {recovered bucket ∪ batch rows}. */
  private def mergeSwapBucket(rows: DataFrame,
      fs: org.apache.hadoop.fs.FileSystem,
      bdir: String, tmp: String, bak: String): Unit = {
    val spark = rows.sparkSession
    val merged0 =
      if (fs.exists(new org.apache.hadoop.fs.Path(bdir)))
        spark.read.parquet(bdir).unionByName(rows)
      else rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("city")).orderBy(desc("dt"),
        desc("temperature"), desc("humidity")) // total over stored cols
    val merged = merged0
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // one file per bucket: a bucket is sized to one task's rewrite budget
    // (see StoreBuckets), so the shuffle's N output partitions would just
    // seed the small-files problem compactStore exists to clean up
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    swapDir(fs, bdir, tmp, bak)
  }

  /** Small-files compaction for the partitioned stores (the bucket upsert
    * store and the per-day sketch/CMS stores): every micro-batch rewrite
    * and every new day adds files, and a store that has run for months
    * accumulates a small-files problem — more tasks, more open()s, more
    * namenode pressure at scale — even though each partition's LOGICAL
    * content is one city set or one sketch row. This maintenance pass
    * rewrites each `<prefix>X` partition dir holding more than `maxFiles`
    * data files into a single file via the same two-rename [[swapDir]]
    * (readers never observe a partial partition; a crash mid-compaction
    * is recovered by the stores' normal [[recoverDirs]] sweep). Content
    * is unchanged by construction — read-coalesce-write of the same rows.
    * O(oversized partitions) work; untouched partitions are not opened.
    * Run out-of-band (a maintenance tick between batches), like a table
    * format's OPTIMIZE. */
  def compactStore(spark: SparkSession, store: String, prefix: String,
      maxFiles: Int = 1): Unit = {
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    recoverDirs(fs, store, prefix)
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .foreach { st =>
        val name = st.getPath.getName
        val nData = fs.listStatus(st.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        if (nData > maxFiles) {
          val (dir, tmp, bak) =
            (s"$store/$name", s"$store.tmp/$name", s"$store.bak/$name")
          spark.read.parquet(dir).coalesce(1)
            .write.mode("overwrite").parquet(tmp)
          swapDir(fs, dir, tmp, bak)
        }
      }
  }

  /** Wire [[upsertBatch]] as a streaming sink. */
  def upsertStream(obs: DataFrame, store: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    obs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsertBatch(b.toDF(), store))
      .start()

  /** Relative-error bound of the streaming percentile store's sketches. */
  val SketchAlpha = 0.01

  /** Incremental per-day QUANTILE-SKETCH store: the streaming composition
    * of the mergeable log-bucket sketch (`graft.functions.QSketch`, the
    * `percentile_store_merge` key) with the O(batch) bucket-store
    * discipline of [[upsertBatch]]. Each micro-batch folds its
    * temperatures into one sketch per observation DAY and merges it into
    * that day's stored sketch — only days the batch touches are rewritten
    * (two-rename swap per day dir, same crash-safety). Counter addition
    * is NOT idempotent, so replay safety comes from the batch-id guard in
    * [[mergeDayStore]], not from the merge algebra. The store stays tiny
    * (one ~KB row per day) yet answers "p90 over any day range" without
    * ever rescanning observations — the dashboard-statistics upgrade of
    * the reference's full-store recompute every 300 s (`app.py:118-124`). */
  def sketchStoreBatch(batch: DataFrame, store: String, batchId: Long,
      queryId: String = "batch"): Unit = {
    import graft.functions.{QuantileMergeAgg, QuantileSketchAgg}
    mergeDayStore(
      batch.select(to_date(col("obs_ts")).as("day"), col("temperature")),
      store, batchId, queryId,
      df => df.agg(QuantileSketchAgg(col("temperature"), SketchAlpha).as("sk")),
      df => df.agg(QuantileMergeAgg(col("sk")).as("sk")))
  }

  /** The stable identity of the streaming query that owns `checkpoint` —
    * the `id` field of the checkpoint's metadata file. This is the right
    * incarnation token for the day stores' replay guard: it SURVIVES
    * restarts from the same checkpoint (so a crash-replayed batch under a
    * new runId is still recognized as already merged) but is REGENERATED
    * when the checkpoint is reset — so a fresh query whose batch ids
    * restart at 0 can never be mistaken for the old query's batch 0 and
    * silently dropped. (runId would be wrong here: it changes on every
    * restart, which would turn legitimate crash-replays into double
    * counts.) Read lazily per batch — KB-sized file, OS-cached. */
  private[streaming] def checkpointQueryId(spark: SparkSession,
      checkpoint: String): String = {
    val path = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) "batch"
    else {
      val in = fs.open(path)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        // {"id":"<uuid>"} — extract without a JSON dependency
        val m = java.util.regex.Pattern.compile("\"id\"\\s*:\\s*\"([^\"]+)\"")
          .matcher(txt)
        if (m.find()) m.group(1) else "batch"
      } finally in.close()
    }
  }

  /** The per-day mergeable-sketch store discipline, shared by the
    * quantile and Count-Min stores: for each day the batch touches, fold
    * that day's rows into ONE sketch row (`sketchOf`), merge it with the
    * stored row (`mergeOf` over their union), and swap the day dir with
    * the two-rename crash-safe sequence of [[upsertBatch]]. Untouched
    * day dirs are never rewritten — O(touched days), not O(store).
    *
    * Two failure modes [[upsertBatch]]'s rank-1 dedupe absorbs for free
    * need explicit handling here, because counter ADDITION is not
    * idempotent:
    *  - REPLAY: the stored row carries the (query_id, batch_id) of the
    *    last batch merged into it; a foreachBatch retry of that same
    *    batch (only the most recent uncommitted batch can replay) finds
    *    its own pair and skips the day instead of double-counting. The
    *    query id half ([[checkpointQueryId]]) is what makes the guard
    *    safe against CHECKPOINT RESETS: a new checkpoint means new batch
    *    ids from 0, and without the query id a colliding id would
    *    silently drop the new query's first batches.
    *  - STRANDED .bak: the swap is recovered by an all-days sweep up
    *    front ([[recoverDirs]]), not per-touched-day — a crash on the
    *    LAST batch that would ever touch a day must not leave that day
    *    invisible to readers forever. */
  /** Most distinct days one micro-batch may touch before [[mergeDayStore]]
    * refuses: 400 covers a full year plus watermark slop of late days at
    * one swap job each (~seconds of driver work), while keeping the
    * per-batch day collect ≈10 KB. Exceeding it means a batch is really a
    * bulk backfill, which belongs in bounded slices. */
  private[graft] val MaxDaysPerBatch = 400

  private[graft] def mergeDayStore(withDay: DataFrame, store: String, batchId: Long,
      queryId: String,
      sketchOf: DataFrame => DataFrame,
      mergeOf: DataFrame => DataFrame): Unit = {
    val spark = withDay.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    recoverDirs(fs, store, "day=")
    // Days-per-batch is watermark-bounded in steady state, but a
    // checkpoint-reset backfill (or a replay of months of broker backlog
    // in one micro-batch) is not — cap the driver-side day spine the way
    // DedupOps.SmallGraphEdgeCap caps the union-find collect. limit(+1)
    // bounds the collect itself; the failure tells the operator to split
    // the backfill (maxOffsetsPerTrigger / smaller source slices) rather
    // than silently looping 10⁴ per-day swap jobs off one batch.
    val days = withDay.select("day").distinct()
      .limit(MaxDaysPerBatch + 1)
      .collect().map(_.getDate(0)).sortBy(_.toString)
    require(days.length <= MaxDaysPerBatch,
      s"mergeDayStore: one micro-batch spans > $MaxDaysPerBatch distinct " +
        "days — split the backfill (bound the source per trigger) instead " +
        "of merging years of history in a single batch")
    days.foreach { d =>
      val (dayDir, tmp, bak) = (s"$store/day=$d", s"$store.tmp/day=$d",
        s"$store.bak/day=$d")
      val batchSk = sketchOf(withDay.filter(col("day") === lit(d)))
      val merged =
        if (fs.exists(p(dayDir))) {
          val stored = spark.read.parquet(dayDir)
          // both halves must match: same batch id from a DIFFERENT query
          // incarnation (reset checkpoint) is new data, not a replay.
          // query_id missing = a pre-round-7 store; its batch_id-only
          // guard semantics are preserved.
          val alreadyMerged = stored.columns.contains("batch_id") && {
            val head = stored
              .select(max(col("batch_id")).as("b"),
                if (stored.columns.contains("query_id"))
                  max(col("query_id")).as("q") else lit(queryId).as("q"))
              .head()
            head.getLong(0) == batchId && head.getString(1) == queryId
          }
          if (alreadyMerged) {
            // replayed batch: the merge is done, but the original attempt
            // may have crashed between its final two steps — clear the
            // leftover .bak so stale pre-merge data can't linger forever
            fs.delete(p(bak), true)
            None
          } else Some(mergeOf(stored.select(col("sk")).unionByName(batchSk)))
        } else Some(batchSk)
      merged.foreach { out =>
        out.withColumn("batch_id", lit(batchId))
          .withColumn("query_id", lit(queryId))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        swapDir(fs, dayDir, tmp, bak)
      }
    }
  }

  /** Incremental per-day TERM-FREQUENCY store: the Count-Min twin of
    * [[sketchStoreBatch]] over the city key. Same day-dir swap, same
    * O(touched days) updates; the stored 64 KB sketches answer "how many
    * observations did city X report on these days" by counter addition,
    * never rescanning observations. */
  def cmStoreBatch(batch: DataFrame, store: String, batchId: Long,
      queryId: String = "batch"): Unit = {
    import graft.functions.{CountMinMergeAgg, CountMinSketchAgg}
    mergeDayStore(
      batch.select(to_date(col("obs_ts")).as("day"), col("city")),
      store, batchId, queryId,
      df => df.agg(CountMinSketchAgg(col("city")).as("sk")),
      df => df.agg(CountMinMergeAgg(col("sk")).as("sk")))
  }

  /** Wire [[cmStoreBatch]] as a streaming sink. */
  def cmStoreStream(obs: DataFrame, store: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    obs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        cmStoreBatch(b.toDF(), store, id,
          checkpointQueryId(b.sparkSession, checkpoint)))
      .start()

  /** Query side of the frequency store: merge the stored per-day
    * sketches (a day-range read stays partition-pruned) and estimate
    * each requested key's count. KB-sized reads only. */
  def cmStoreCounts(spark: SparkSession, store: String,
      keys: Seq[String]): DataFrame = {
    import graft.functions.{CountMinEstimate, CountMinMergeAgg}
    val merged = spark.read.parquet(store)
      .agg(CountMinMergeAgg(col("sk")).as("msk"))
    keys.foldLeft(merged) { (df, k) =>
      df.withColumn(s"cnt_$k", CountMinEstimate(col("msk"), lit(k)))
    }.drop("msk")
  }

  /** Wire [[sketchStoreBatch]] as a streaming sink. */
  def sketchStoreStream(obs: DataFrame, store: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    obs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sketchStoreBatch(b.toDF(), store, id,
          checkpointQueryId(b.sparkSession, checkpoint)))
      .start()

  /** Query side of the sketch store: merge the stored per-day sketches
    * (optionally a day range — partition pruning keeps the read to the
    * selected day dirs) and read quantiles out. Reads KB-sized sketch
    * rows, never the observations. */
  def sketchStoreQuantiles(spark: SparkSession, store: String,
      qs: Seq[Double]): DataFrame = {
    import graft.functions.{QuantileEstimate, QuantileMergeAgg}
    val merged = spark.read.parquet(store)
      .agg(QuantileMergeAgg(col("sk")).as("msk"))
    qs.foldLeft(merged) { (df, q) =>
      df.withColumn(s"p${(q * 100).round}", QuantileEstimate(col("msk"), q))
    }.drop("msk")
  }

  /** Streaming form of the clean/quarantine split: per micro-batch, valid
    * rows append to `store` and unparseable payloads append to `quarPath`
    * — the durable upgrade of the reference's except-branch print
    * (`producer.py:43-44`). One parse per batch (both sides share the
    * flagged plan); exactly-once by checkpoint + idempotent-append per
    * epoch. */
  def quarantineStream(rawStream: DataFrame, json: Column, store: String,
      quarPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rawStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (clean, quar) = ingestWithQuarantine(b.toDF(), json)
        clean.write.mode("append").parquet(store)
        quar.write.mode("append").parquet(quarPath)
      }
      .start()

  /** Stateful extension (SURVEY §2.8): per-city tumbling-window average
    * temperature with a watermark bounding state. */
  def tumblingAvg(obs: DataFrame): DataFrame =
    obs.withWatermark("obs_ts", "10 minutes")
      .groupBy(window(col("obs_ts"), "5 minutes"), col("city"))
      .agg(avg(col("temperature")).as("avg_temp"), count(lit(1)).as("n_obs"))
      .select(col("window.start").as("win_start"), col("city"),
        col("avg_temp"), col("n_obs"))

  /** Batch-queryable equivalent of the tumbling window over the events
    * table (1-hour windows), for the driver's oracle. */
  def streamTumblingAvg(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.avgMoney(col("value")).as("avg_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("event_type"), col("cnt"), col("avg_value"))
      .orderBy("hour_s", "event_type")
  }

  // ── exact distinct users per tumbling hour — the batch twin of the
  // streaming dropDuplicates(h, user) → windowed count pipeline
  // (IngestPipelineSpec pins the file-stream form equal). countDistinct
  // is unsupported inside a streaming aggregation, so the STREAM
  // expresses it as dedup-then-count; this batch form is the semantics
  // both must agree on. In production the stream carries a watermark so
  // the dedup state ages out with the window. ──
  def streamTumblingUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_s"),
        col("users"), col("cnt"))
      .orderBy("hour_s")

  // ── distinct users per 2-hour hopping window sliding hourly — the
  // overlapping-window twin of [[streamTumblingUsers]] (tumbling
  // answers "this hour's reach"; hopping answers "trailing-2h reach,
  // refreshed hourly" — the smoother a live dashboard actually wants).
  // Same dedup-then-count streaming semantics; each event lands in
  // exactly 2 windows, so stream state stays 2× the tumbling form. The
  // oracle replays Spark's window cover rule exactly: starts = the
  // event's hour floor and the hour before. ──
  def streamHoppingUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start_s"),
        col("users"), col("cnt"))
      .orderBy("win_start_s")

  // ── per-user SESSION windows via the native `session_window`
  // generator — the third window family next to tumbling and hopping:
  // data-driven extents (a session ends only when the user goes quiet
  // for 30 min), which is what Structured Streaming's session-window
  // state store computes incrementally. This batch form is the
  // semantics contract: window.start = first event, window.end = last
  // event + gap, events chain while consecutive gaps stay ≤ the
  // 30-min gap — exactly the [[graft.operators.AdvancedOps.sessionize]]
  // rule, so the oracle replays gap sessionization and derives the
  // window bounds arithmetically (a cross-check that Spark's native
  // operator and the classic lag/cumsum construction agree row for
  // row). Grouping keys partition the state — per-user, bounded,
  // parallel. ──
  def streamSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("sess_start_s"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end_s"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start_s")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_avg" -> streamTumblingAvg _,
    "stream_tumbling_users" -> streamTumblingUsers _,
    "stream_hopping_users" -> streamHoppingUsers _,
    "stream_session_window" -> streamSessionWindow _,
  )

  val oracles: Map[String, String] = Map(
    "stream_session_window" ->
      """WITH seq AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "value",
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events),
        |flags AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS is_new
        |  FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sid
        |  FROM flags)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start_s,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |    AS sess_end_s,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_s""".stripMargin,
    "stream_hopping_users" ->
      """WITH e AS (SELECT date_trunc('hour', ts) AS h, user_id
        |           FROM events),
        |cov AS (SELECT h AS ws, user_id FROM e
        |        UNION ALL
        |        SELECT h - INTERVAL 1 HOUR AS ws, user_id FROM e)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start_s,
        |  count(DISTINCT user_id) AS users, count(*) AS cnt
        |FROM cov GROUP BY 1 ORDER BY win_start_s""".stripMargin,
    "stream_tumbling_users" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_s,
        |  count(DISTINCT user_id) AS users, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY hour_s""".stripMargin,
    "stream_tumbling_avg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) / count("value") AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,
  )
}
