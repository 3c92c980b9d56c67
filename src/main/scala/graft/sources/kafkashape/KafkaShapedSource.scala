package graft.sources.kafkashape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Kafka-shaped streaming SOURCE — the read side of the parquet-per-topic
  * transport `KafkaShapedSink` writes, closing the §2B "Kafka source"
  * row in shape: the record model mirrors what `readStream.format
  * ("kafka")` yields, with the epoch in place of a broker offset.
  *
  * The swap to the real connector is the format string PLUS these
  * mechanical column deltas (the real connector's schema is fixed by
  * Spark and not configurable):
  *  - `key`/`value` arrive as BINARY there (`CAST(value AS STRING)` is
  *    the standard first projection; here the sink's transport type is
  *    preserved, string by default);
  *  - the event time is a TimestampType column named `timestamp`, not
  *    this source's epoch-millis long `ts` —
  *    `to_timestamp(ts / 1000.0)` bridges;
  *  - the consumer position is `offset: LONG` per (topic, partition),
  *    plus a `timestampType: INT` tag; here the position is the
  *    coarser `epoch: LONG` directory (no per-record offset exists in
  *    a file log) and `timestampType` is absent.
  * Everything else — `topic: STRING`, `partition: INT`, exactly-once
  * delivery per record, per-topic subscription pruning — carries over
  * unchanged.
  *
  * Transport semantics come from Spark's file streaming source, which is
  * the honest analog of a consumer group's position: newly LANDED epoch
  * directories are discovered per micro-batch, each file is processed
  * exactly once (the file-source seen-files log in the checkpoint), and
  * a restart resumes from the checkpoint without re-reading delivered
  * epochs. `topic=` is a hive partition column, so per-topic reads prune
  * at the directory level — the file-layout equivalent of subscribing to
  * one topic.
  */
object KafkaShapedSource {

  /** The record schema the sink writes (`value` as string transport;
    * binary-valued topics read with `valueType = BinaryType`).
    */
  def recordSchema(valueType: DataType = StringType): StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", valueType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("ts", LongType, nullable = true),
    // hive partition columns of the sink layout
    StructField("topic", StringType, nullable = true),
    StructField("epoch", LongType, nullable = true)))

  /** Streaming read of every topic under `path`.
    *
    * `maxFilesPerTrigger` is the admission-control knob (the analog of
    * the real connector's `maxOffsetsPerTrigger`): after an outage the
    * checkpoint position lags the log head by many epochs, and without
    * a bound the file source replays the entire backlog as ONE
    * micro-batch — the restart batch that OOMs at 100 TB. Bounded, the
    * backlog drains as a sequence of ≤ n-file batches, each committed
    * in the seen-files log, so a second failure mid-drain loses no
    * progress. Unset (≤ 0) admits everything, the prior behavior.
    */
  def readStream(spark: SparkSession, path: String,
      valueType: DataType = StringType,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream
      .schema(recordSchema(valueType))
      .option("basePath", path)
    val bounded =
      if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else r
    bounded.parquet(path)
  }

  /** Streaming read of ONE topic — directory-level pruning, the
    * subscribe analog. */
  def readTopic(spark: SparkSession, path: String, topic: String,
      valueType: DataType = StringType,
      maxFilesPerTrigger: Int = 0): DataFrame =
    readStream(spark, path, valueType, maxFilesPerTrigger)
      .filter(col("topic") === topic)
}
