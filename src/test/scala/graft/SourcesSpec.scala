package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Sources

/** S6 + S4 — the two sources the specs never drove: the rate-limited
  * synthetic generator (`state/generator/EventsGeneratorSource.java:
  * 9-45`) and the explicit-field-order CSV read
  * (`topn/HotItems.java:47-55`).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def pollUntil(cond: => Boolean, what: String): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!cond) {
      assert(System.nanoTime() < deadline, s"timed out waiting: $what")
      Thread.sleep(200)
    }
  }

  test("rate source synthesizes deterministic event fields") {
    val q = Sources.syntheticEvents(spark, 100)
      .writeStream.format("memory").queryName("rate_raw")
      .outputMode("append").start()
    try pollUntil(spark.table("rate_raw").count() >= 20, "rate rows")
    finally q.stop()

    val rows = spark.table("rate_raw")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, Long, String, Double)].collect()
    assert(rows.length >= 20)
    // event_ids are the rate source's distinct monotonic values
    assert(rows.map(_._1).distinct.length == rows.length)
    val types = Seq("view", "click", "purchase", "signup", "error")
    rows.foreach { case (id, user, tpe, v) =>
      assert(user == id % 97)
      assert(tpe == types((id % 5).toInt))
      assert(v == (id * 37 % 1000) / 10.0)
    }
  }

  test("rate source drives a watermarked windowed aggregation") {
    val agg = Sources.syntheticEvents(spark, 200)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 second"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("rate_agg")
      .outputMode("update").start()
    try pollUntil(spark.table("rate_agg").count() >= 1, "windowed counts")
    finally q.stop()

    val got = spark.table("rate_agg")
      .select(col("event_type"), col("n")).as[(String, Long)].collect()
    val types = Set("view", "click", "purchase", "signup", "error")
    assert(got.nonEmpty)
    assert(got.forall { case (t, n) => types(t) && n >= 1 })
  }

  test("csv reads the HotItems fixture with explicit field order") {
    // UserBehavior.csv rows (taobao format): userId, itemId,
    // categoryId, behavior, timestamp — the order the reference pins
    // explicitly because POJO reflection order is unstable
    val dir = Files.createTempDirectory("s4_csv")
    Files.write(dir.resolve("UserBehavior.csv"), java.util.Arrays.asList(
      "543462,1715,1464116,pv,1511658000",
      "662867,2244074,1575622,pv,1511658000",
      "561558,3611281,965809,fav,1511658001"))
    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("itemId", LongType),
      StructField("categoryId", IntegerType),
      StructField("behavior", StringType),
      StructField("timestamp", LongType)))
    val got = Sources.csv(spark, dir.toString, schema)
      .as[(Long, Long, Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (543462L, 1715L, 1464116, "pv", 1511658000L),
      (561558L, 3611281L, 965809, "fav", 1511658001L),
      (662867L, 2244074L, 1575622, "pv", 1511658000L)))
  }

  test("json doc source parses the canned docs and drops malformed lines (S8)") {
    // batch path: file dir of JSON lines
    val dir = Files.createTempDirectory("s8_json")
    Files.write(dir.resolve("docs.json"),
      scala.jdk.CollectionConverters.SeqHasAsJava(Sources.sampleJsonDocs).asJava)
    val batch = Sources.jsonDocs(spark, dir.toString)
      .select("id", "lang").as[(Long, String)].collect().sortBy(_._1)
    assert(batch.toSeq == Seq((1L, "en"), (2L, "de"), (3L, "en")))

    // stream path: string payloads (socket/Kafka value shape) decoded
    // per micro-batch, aggregated by language like the reference demo
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Sources.jsonDocsFromStrings(in.toDF())
      .groupBy(col("lang")).count()
      .writeStream.format("memory").queryName("s8_out")
      .outputMode("complete").start()
    try {
      in.addData(Sources.sampleJsonDocs: _*)
      q.processAllAvailable()
      val counts = spark.table("s8_out")
        .as[(String, Long)].collect().toMap
      assert(counts == Map("en" -> 2L, "de" -> 1L))
    } finally q.stop()
  }

  test("kafka source contract: option map wiring + frame-shape decode (S5/K6)") {
    // no broker exists in this container, so the contract is locked in
    // two broker-free halves (`kafka/Kafka2Kafka.java:50-82`):
    // 1. the exact options the reader is fed — including per-partition
    //    JSON startingOffsets and the throttle knob
    val perPartition = """{"logs":{"0":23,"1":-2}}"""
    val opts = Sources.kafkaOptions("broker1:9092,broker2:9092", "logs",
      perPartition, maxOffsetsPerTrigger = Some(5000L))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "logs",
      "startingOffsets" -> perPartition,
      "maxOffsetsPerTrigger" -> "5000"))
    // defaults: latest offsets, no throttle option at all (an absent
    // option, not a null/zero one)
    assert(Sources.kafkaOptions("b:9092", "t") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "latest"))
    // the builder consumes exactly this map (reflection on the classic
    // DataStreamReader's private option store)
    val reader = Sources.kafka(spark, "b:9092", "t",
      maxOffsetsPerTrigger = Some(100L))
    val f = reader.getClass.getDeclaredFields
      .find(_.getName.contains("extraOptions"))
      .getOrElse(fail("DataStreamReader option field moved"))
    f.setAccessible(true)
    val wired = f.get(reader).asInstanceOf[Map[String, String]]
    assert(Sources.kafkaOptions("b:9092", "t",
      maxOffsetsPerTrigger = Some(100L)).forall { case (k, v) =>
        wired.get(k).contains(v) })

    // 2. the (key, value binary, timestamp) frame shape a Kafka batch
    //    delivers, decoded by the same column transforms the pipeline
    //    wires: JSON value → Log schema, LE-binary value → int32 fields
    val frame = Seq(
      (Array[Byte](107), """{"plat":"ios","lt":"pv","user_id":7,"timestamp":1511658000000}""".getBytes("UTF-8"),
        "logs", 0, 42L, new java.sql.Timestamp(1511658000000L), 0),
      (Array[Byte](108), """not json""".getBytes("UTF-8"),
        "logs", 1, 43L, new java.sql.Timestamp(1511658001000L), 0)
    ).toDF("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType")
    val logs = graft.streaming.KafkaPipeline.decode(frame)
      .filter(col("user_id").isNotNull)
      .select("plat", "lt", "user_id", "timestamp")
      .as[(String, String, Int, Long)].collect()
    assert(logs.toSeq == Seq(("ios", "pv", 7, 1511658000000L)))
    // binary serde: the LE payload decodes back through leInt32
    val bin = Seq((Sources.leInt32Bytes(-123456789) ++
        Sources.leInt32Bytes(3), 1L))
      .toDF("value", "offset")
    val decoded = bin.select(
      Sources.leInt32(col("value"), 0).as("addr"),
      Sources.leInt32(col("value"), 4).as("tpe"))
      .as[(Int, Int)].collect().head
    assert(decoded == ((-123456789, 3)))
    // encode side round-trips through the sink's value projection
    val out = graft.streaming.KafkaPipeline.encode(
      graft.streaming.KafkaPipeline.decode(frame)
        .filter(col("user_id").isNotNull))
      .as[String].collect().head
    assert(out.contains(""""plat":"ios"""") && out.contains(""""user_id":7"""))

    // 3. the PRODUCER contract (K6): kafkaSink's payload projection —
    //    a pre-encoded value column passes through as string, any
    //    other schema becomes one JSON value column (what the Kafka
    //    sink requires) — and the exact writer options it wires
    val passthrough = graft.streaming.Sinks.kafkaPayload(
      Seq(("k1", "payload")).toDF("ignored", "value"))
    assert(passthrough.columns.toSeq == Seq("value"))
    assert(passthrough.as[String].collect().toSeq == Seq("payload"))
    val encoded = graft.streaming.Sinks.kafkaPayload(
      Seq(("ios", 7)).toDF("plat", "user_id"))
    assert(encoded.columns.toSeq == Seq("value"))
    assert(encoded.as[String].collect().head ==
      """{"plat":"ios","user_id":7}""")
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val w = graft.streaming.Sinks.kafkaSink(ms.toDF(),
      "broker1:9092,broker2:9092", "out_topic", "/tmp/k6_ckpt")
    val wf = w.getClass.getDeclaredFields
      .find(_.getName.contains("extraOptions"))
      .getOrElse(fail("DataStreamWriter option field moved"))
    wf.setAccessible(true)
    val sinkOpts = wf.get(w) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, String]]
      case m => m.asInstanceOf[scala.collection.Map[String, String]].toMap
    }
    assert(sinkOpts.get("kafka.bootstrap.servers")
      .contains("broker1:9092,broker2:9092"))
    assert(sinkOpts.get("topic").contains("out_topic"))
    assert(sinkOpts.get("checkpointLocation").contains("/tmp/k6_ckpt"))
    val sf = w.getClass.getDeclaredFields
      .find(_.getName.contains("source"))
      .getOrElse(fail("DataStreamWriter source field moved"))
    sf.setAccessible(true)
    assert(sf.get(w) == "kafka")
  }
}
