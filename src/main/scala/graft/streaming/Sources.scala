package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Source wrappers (SURVEY.md §2.1). Streaming tests drive these with
  * MemoryStream; production wiring is file/kafka/rate.
  */
object Sources {

  /** S1: line-oriented text. Batch or stream (`isStream`). */
  def text(spark: SparkSession, path: String, isStream: Boolean = false): DataFrame =
    if (isStream) spark.readStream.text(path) else spark.read.text(path)

  /** S4: CSV with an explicit schema + column order (the reference's
    * PojoCsvInputFormat with field order, `topn/HotItems.java:47-55`). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          isStream: Boolean = false): DataFrame =
    if (isStream) spark.readStream.schema(schema).csv(path)
    else spark.read.schema(schema).csv(path)

  /** S5: Kafka source options (`kafka/Kafka2Kafka.java:50-82`).
    * startingOffsets: "latest" | "earliest" | per-partition JSON —
    * same offset semantics, tracked in the query's checkpoint (the
    * reference's commit-on-checkpoint note, Kafka2Kafka.java:62).
    * Returned unstarted so tests can inspect; `.load()` to run.
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String,
            startingOffsets: String = "latest",
            maxOffsetsPerTrigger: Option[Long] = None) =
    spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic, startingOffsets,
        maxOffsetsPerTrigger))

  /** The exact option map `kafka` wires — exposed so the contract is
    * sbt-assertable in a broker-less container (SourcesContractSpec):
    * the DataStreamReader keeps its options private, and this is the
    * single source of truth it is fed from. */
  def kafkaOptions(bootstrap: String, topic: String,
                   startingOffsets: String = "latest",
                   maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  /** S6: rate-limited synthetic event generator — the Spark shape of
    * the reference's throttled random sources
    * (`state/generator/EventsGeneratorSource.java:9-45`): the `rate`
    * source provides (timestamp, value); deterministic arithmetic on
    * `value` synthesizes fields. Per-partition id ranges come free
    * from the rate source's monotonically increasing value.
    */
  def syntheticEvents(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(
        col("timestamp").as("ts"),
        col("value").as("event_id"),
        pmod(col("value"), lit(97)).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase"), lit("signup"),
            lit("error")),
          (pmod(col("value"), lit(5)) + 1).cast("int")).as("event_type"),
        (pmod(col("value") * 37, lit(1000)) / lit(10.0)).as("value"))

  /** S8: JSON document stream — the reference's Twitter source
    * (`json/TwitterJson.java:36-48`) modeled as a schema'd JSON-lines
    * source: an external feed becomes a file/socket/Kafka stream of
    * one JSON object per line. Explicit schema (no inference on a
    * stream), malformed lines dropped by the `id` null filter rather
    * than failing the query.
    */
  val jsonDocSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("user", StringType),
    StructField("lang", StringType), StructField("text", StringType),
    StructField("created_ms", LongType)))

  def jsonDocs(spark: SparkSession, path: String,
               isStream: Boolean = false): DataFrame = {
    val df = if (isStream) spark.readStream.schema(jsonDocSchema).json(path)
             else spark.read.schema(jsonDocSchema).json(path)
    df.filter(col("id").isNotNull)
  }

  /** Same decode for string payloads already on a stream (socket or
    * Kafka value column) — the shape the reference's source actually
    * delivers. */
  def jsonDocsFromStrings(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .select(from_json(col(valueCol), jsonDocSchema).as("d"))
      .select(col("d.*"))
      .filter(col("id").isNotNull)

  /** The canned-fallback documents the reference ships for
    * credential-less runs (`json/util/TwitterExampleData.java:5-8`),
    * re-authored: three docs, two languages, one malformed line to
    * exercise the drop path. */
  val sampleJsonDocs: Seq[String] = Seq(
    """{"id": 1, "user": "ada", "lang": "en", "text": "distributed queries finish fast", "created_ms": 1000}""",
    """{"id": 2, "user": "bo", "lang": "de", "text": "verteilte abfragen laufen schnell", "created_ms": 2000}""",
    """{"id": 3, "user": "cy", "lang": "en", "text": "windows close when watermarks pass", "created_ms": 3000}""",
    """not json at all""")

  /** S5 payload decode: little-endian int32 at byte `offset` of a
    * binary column — the reference's custom binary serde
    * (`schema/EventDeSerializer.java:21-39`) as a pure built-in
    * expression chain (hex → conv → reassemble), fully codegen'd:
    * no UDF in the hot path.
    */
  def leInt32(bin: Column, offset: Int): Column = {
    def byteAt(i: Int): Column =
      conv(hex(substring(bin, offset + 1 + i, 1)), 16, 10).cast("long")
    val unsigned =
      byteAt(0) + byteAt(1) * 256L + byteAt(2) * 65536L + byteAt(3) * 16777216L
    // two's-complement reinterpretation: ANSI mode rejects a plain
    // overflowing cast of values >= 2^31
    when(unsigned >= 2147483648L, unsigned - 4294967296L)
      .otherwise(unsigned).cast("int")
  }

  /** Encode side of the same layout (`EventDeSerializer.java:27-39`):
    * (sourceAddress, eventTypeOrdinal) → 8-byte LE payload. */
  def leInt32Bytes(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
}
