package graft.sources.kafkashape

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Kafka-shaped streaming SOURCE — the read side of the parquet-per-topic
  * transport `KafkaShapedSink` writes, closing the §2B "Kafka source"
  * row in shape: the record model is exactly what
  * `readStream.format("kafka")` yields (key, value, topic, partition,
  * timestamp, plus the epoch in place of a broker offset), so a
  * downstream pipeline written against this source moves to the real
  * connector by swapping the format string.
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

  /** Streaming read of every topic under `path`. */
  def readStream(spark: SparkSession, path: String,
      valueType: DataType = StringType): DataFrame =
    spark.readStream
      .schema(recordSchema(valueType))
      .option("basePath", path)
      .parquet(path)

  /** Streaming read of ONE topic — directory-level pruning, the
    * subscribe analog. */
  def readTopic(spark: SparkSession, path: String, topic: String,
      valueType: DataType = StringType): DataFrame =
    readStream(spark, path, valueType).filter(col("topic") === topic)
}
