package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka wire-schema adapter for the ingest pipeline.
  *
  * This offline environment has no broker, so `readStream.format("kafka")`
  * cannot run — but the SHAPE a Kafka source hands the query is fixed and
  * public: one row per record with columns (key, value, topic, partition,
  * offset, timestamp, timestampType), key/value as bytes. Everything the
  * engine does starts AFTER that contract, so the integration is testable
  * without a broker: [[wrap]] produces wire-shaped records (the broker's
  * side of the contract, standing in for `producer.py:27-41`'s
  * value-serialized sends) and [[consume]] is the ONE consumer line that
  * a production deployment keeps — bytes → string → the same `ingest`
  * plan (`consumer.py:18-25`'s subscribe + the per-message loop, as a
  * declarative plan).
  *
  * Offset semantics upgrade (`consumer.py:21-22`): the reference relies on
  * `auto_offset_reset='latest'` + auto-commit — at-least-once, with the
  * commit point detached from the MongoDB write. Here the committed
  * position lives in the query CHECKPOINT, written atomically with each
  * epoch: a restart resumes from exactly the committed offset, processing
  * every record exactly once (pinned in KafkaWireSpec's restart test).
  */
object KafkaWire {

  /** The exact column set a Kafka source emits, in its order. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Broker-side shaping: payload rows → wire records. Unkeyed (the
    * reference producer sends value-only JSON), partition assigned by
    * offset modulus — the round-robin a keyless producer gets. */
  def wrap(records: DataFrame, offsetCol: Column, jsonCol: Column,
      tsCol: Column, topic: String, nPartitions: Int): DataFrame =
    records.select(
      lit(null).cast("binary").as("key"),
      jsonCol.cast("string").cast("binary").as("value"),
      lit(topic).as("topic"),
      pmod(offsetCol, lit(nPartitions)).cast("int").as("partition"),
      offsetCol.cast("long").as("offset"),
      tsCol.cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"))

  /** Consumer-side entry: the full ingest plan over wire records. The
    * `CAST(value AS STRING)` is the canonical first line of every Kafka
    * consumer query; everything after it is the SAME plan batch runs. */
  def consume(wire: DataFrame): DataFrame =
    IngestPipeline.ingest(wire, col("value").cast("string"))
}
