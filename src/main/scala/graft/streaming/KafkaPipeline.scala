package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** The Kafka2Kafka end-to-end pipeline (SURVEY.md §3.3,
  * `flink-stream-connectors/.../kafka/Kafka2Kafka.java:34-168`):
  * Kafka source → JSON decode to the Log schema → event-time watermark
  * → JSON encode → Kafka sink, checkpointed. The decode/encode core is
  * a pure column transform so it is testable without a broker; the
  * wiring functions attach the Kafka endpoints.
  *
  * Delivery: Spark's Kafka sink is at-least-once (no producer
  * transactions, unlike the reference's EXACTLY_ONCE 2PC,
  * `Kafka2Kafka.java:125-139`); the checkpointed source offsets +
  * keyed/idempotent downstream give the same effective guarantee.
  */
object KafkaPipeline {

  /** `pojo/Log.java:6-13`: user_id is the JSON name (renamed field),
    * timestamp is epoch millis event time. */
  val logSchema: StructType = StructType(Seq(
    StructField("plat", StringType),
    StructField("lt", StringType),
    StructField("user_id", IntegerType),
    StructField("timestamp", LongType)))

  /** value bytes → typed Log columns + event-time watermark
    * (`Kafka2Kafka.java:84-113`). */
  def decode(raw: DataFrame, watermarkDelay: String = "0 seconds"): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), logSchema).as("log"))
      .select(col("log.*"))
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermarkDelay)

  /** typed columns → JSON value (`Kafka2Kafka.java:154-163`). */
  def encode(logs: DataFrame): DataFrame =
    logs.select(to_json(struct(
      col("plat"), col("lt"), col("user_id"), col("timestamp"))).as("value"))

  /** Full pipeline, unstarted: caller `.start()`s it. Requires the
    * spark-sql-kafka connector on the classpath (not bundled in the
    * test container — decode/encode are tested broker-free). */
  def pipeline(spark: SparkSession, bootstrap: String, inTopic: String,
               outTopic: String, checkpoint: String,
               startingOffsets: String = "latest"): DataStreamWriter[Row] = {
    val raw = Sources.kafka(spark, bootstrap, inTopic, startingOffsets).load()
    Sinks.kafkaSink(encode(decode(raw)), bootstrap, outTopic, checkpoint)
  }
}
