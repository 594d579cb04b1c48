package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (north star: "treat image/audio/video as
  * opaque binary columns with typed metadata").
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeDecoder]]); everything Spark
  * cares about — the binary column, the typed metadata struct, the
  * partition-preserving batched `mapPartitions` shape (the Scala analogue
  * of `mapInPandas`: one iterator per partition, never a per-row UDF
  * round-trip), and the output schema — is real and tested.
  *
  * At 100 TB: payloads live in parquet binary columns (or object-store
  * pointers for >row-group-size blobs), metadata in sibling scalar columns
  * so filters like `width > 512` prune row groups WITHOUT touching bytes;
  * the decode stage is a `mapPartitions` over only the filtered rows.
  */
object MultimodalOps {

  /** Typed row for the decode stage: payload + per-item metadata. */
  final case class MediaItem(doc_id: Long, payload: Array[Byte], format: String)

  /** Decoded features. In production this row comes out of a real codec. */
  final case class MediaFeatures(doc_id: Long, format: String, byte_len: Int,
      width: Int, height: Int, checksum: Long)

  /** Deterministic stand-in for an image decoder: derives "dimensions" and
    * a checksum purely from the bytes. Marked fake — swap for a codec. */
  object FakeDecoder {
    def decode(item: MediaItem): MediaFeatures = {
      val bytes = item.payload
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
      MediaFeatures(item.doc_id, item.format, bytes.length,
        width = 64 + (math.abs(sum) % 512).toInt,
        height = 64 + (math.abs(sum / 7) % 512).toInt,
        checksum = sum)
    }
  }

  /** The documents table dressed as a media table: text bytes as the opaque
    * payload + a metadata struct. (The test corpus has no real blobs.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(lit("fake/rgb8").as("format"), col("n_chars").as("n_bytes_meta"),
          col("lang").as("tag")).as("media_meta"))

  // ── oracle-checkable slice of the plumbing: byte length + digest of the
  // binary payload (md5 is identical in Spark and DuckDB). ──
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        md5(col("payload")).as("digest"),
        col("media_meta.format").as("format"))
      .orderBy("doc_id")

  // ── the real decode stage: batched mapPartitions over the typed Dataset.
  // No oracle (the fake decoder is not SQL); verified in ScalaTest. ──
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items: Dataset[MediaItem] = mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("media_meta.format").as("format"))
      .as[MediaItem]
    items
      .mapPartitions(_.map(FakeDecoder.decode)) // one pass per partition batch
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame size of [[multimodalFrames]] in payload bytes. */
  private val FrameBytes = 256

  // ── frame sampling: one row per fixed-size byte window of the payload —
  // the video-frame / audio-chunk access pattern (explode over a computed
  // frame index, then a per-frame slice; each frame row then feeds the
  // decode stage independently, so frames of one blob parallelize across
  // tasks). Sliced on the hex view because DuckDB lacks BLOB substring;
  // hex is 2 chars/byte in both engines, so the window arithmetic is
  // byte-exact and md5-comparable. ──
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), hex(col("payload")).as("hx"),
        octet_length(col("payload")).as("len"))
      .select(col("doc_id"), col("hx"),
        explode(sequence(lit(0L),
          ((greatest(col("len"), lit(1)) - 1) / FrameBytes).cast("long")))
          .as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        (length(substr(col("hx"), col("frame_no") * (FrameBytes * 2) + 1,
          lit(FrameBytes * 2))) / 2).cast("int").as("frame_bytes"),
        md5(substr(col("hx"), col("frame_no") * (FrameBytes * 2) + 1,
          lit(FrameBytes * 2))).as("digest"))
      .orderBy("doc_id", "frame_no")

  // ── exact binary dedup as a two-level digest cascade: level 1 hashes a
  // BOUNDED first-frame prefix (256 bytes — O(1) per row no matter how
  // large the payload), level 2 computes the full digest ONLY inside
  // prefix-colliding groups. On a 100 TB media corpus the cheap prefix
  // pass eliminates almost every row before any full-payload hash or
  // shuffle; only 16-byte digests are ever grouped. Output: one row per
  // (prefix group, full digest) with the canonical (lowest) id, the
  // exact-copy count, and the prefix-group size — n_copies ≥ 2 means
  // byte-identical re-uploads, n_prefix > n_copies means same leading
  // frame but diverging content (a truncation/re-encode suspect for the
  // perceptual pass). ──
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"),
        md5(substr(hex(col("payload")), lit(1), lit(FrameBytes * 2)))
          .as("head"))
    val cand = media.groupBy(col("head"))
      .agg(count(lit(1)).as("n_prefix")).filter(col("n_prefix") >= 2)
    media.join(cand, "head")
      .select(col("head").as("head_digest"), col("doc_id"),
        md5(col("payload")).as("digest"), col("n_prefix"))
      .groupBy(col("head_digest"), col("digest"))
      .agg(min(col("doc_id")).as("canonical"),
        count(lit(1)).as("n_copies"), first(col("n_prefix")).as("n_prefix"))
      .orderBy("canonical", "digest")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode"   -> multimodalDecode _,
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_frames"   -> multimodalFrames _,
    "multimodal_dedup"    -> multimodalDedup _,
  )

  val oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
        |  md5(text) AS digest, 'fake/rgb8' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_dedup" ->
      """WITH m AS (SELECT doc_id, text,
        |             md5(substring(hex(encode(text)), 1, 512)) AS head
        |           FROM documents),
        |c AS (SELECT head, count(*) AS n_prefix FROM m
        |      GROUP BY 1 HAVING count(*) >= 2)
        |SELECT head AS head_digest, md5(text) AS digest,
        |  min(doc_id) AS canonical, count(*) AS n_copies,
        |  any_value(n_prefix) AS n_prefix
        |FROM m JOIN c USING (head)
        |GROUP BY 1, 2 ORDER BY canonical, digest""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
        |             octet_length(encode(text)) AS len FROM documents),
        |f AS (SELECT doc_id, hx,
        |        unnest(range(0, ((greatest(len, 1) - 1) // 256) + 1)) AS frame_no
        |      FROM m)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(length(substring(hx, CAST(frame_no * 512 + 1 AS BIGINT), 512)) / 2 AS INTEGER) AS frame_bytes,
        |  md5(substring(hx, CAST(frame_no * 512 + 1 AS BIGINT), 512)) AS digest
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,
  )
}
