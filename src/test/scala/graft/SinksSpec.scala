package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sinks

/** In-memory endpoint tests for the external-system sinks (K5 JDBC
  * upsert / K7 Redis / K8 ES — all reduce to [[Sinks.UpsertClient]]):
  * the recording client stands in for the zero-egress container's
  * missing endpoints and asserts the reference's semantics —
  * upsert-wins-by-key within a batch (`jdbc/JDBCSink.java:57-76`'s
  * ON DUPLICATE KEY UPDATE) and idempotence under epoch replay (the
  * checkpoint-recovery retry path).
  */
object SinksSpec {
  /** Shared across partitions/instances: local-mode executors live in
    * this JVM, so a companion-object map records every client. */
  val store = new ConcurrentHashMap[String, String]()
  val upserts = new AtomicInteger(0)
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)

  class RecordingClient extends Sinks.UpsertClient {
    override def open(): Unit = opens.incrementAndGet()
    def upsert(key: String, value: String): Unit = {
      store.put(key, value); upserts.incrementAndGet()
    }
    override def close(): Unit = closes.incrementAndGet()
  }

  def reset(): Unit = { store.clear(); upserts.set(0); opens.set(0); closes.set(0) }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._
  import SinksSpec._

  test("upsertBatch dedups to max_by(order) per key and replays idempotently") {
    reset()
    // three writes to key a (orders 1,3,2), one to key b — the winner
    // for a must be the order-3 value, regardless of partition order
    val batch = Seq(("a", "v1", 1L), ("a", "v3", 3L), ("b", "w1", 1L),
      ("a", "v2", 2L)).toDF("k", "v", "ord").repartition(3)
    Sinks.upsertBatch(() => new RecordingClient, "k", "v", "ord",
      batchSize = 2)(batch, epochId = 0L)
    assert(store.get("a") == "v3" && store.get("b") == "w1")
    // ONE upsert per key (the batch dedups before writing), one client
    // lifecycle per call
    assert(upserts.get() == 2 && opens.get() == 1 && closes.get() == 1)
    // checkpoint-replay retry: re-running the same epoch converges to
    // the same state (idempotent upsert, deterministic winner)
    Sinks.upsertBatch(() => new RecordingClient, "k", "v", "ord",
      batchSize = 2)(batch, epochId = 0L)
    assert(store.get("a") == "v3" && store.get("b") == "w1")
    assert(upserts.get() == 4 && closes.get() == 2)
  }

  test("upsertBatch winner is deterministic under value ties on the order column") {
    reset()
    // same order value twice: max_by orders by (ord, value) — an
    // explicit total order, so replays cannot flip the winner
    val batch = Seq(("k", "alpha", 5L), ("k", "beta", 5L))
      .toDF("k", "v", "ord").repartition(2)
    for (_ <- 1 to 3)
      Sinks.upsertBatch(() => new RecordingClient, "k", "v", "ord")(batch, 0L)
    assert(store.get("k") == "beta") // (5,"beta") > (5,"alpha")
    assert(upserts.get() == 3)
  }

  test("end-to-end pipeline: ingest → near-dup admission → quality gate → bucketed file sink") {
    // the composed training-data ingestion story the individual specs
    // imply: one streaming query from raw docs to time-bucketed files
    import graft.streaming.StreamAggs
    import graft.functions.Portable
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pipe_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pipe_ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    val docs = in.toDF().toDF("ts_ms", "doc_id", "text")
    val admitted = StreamAggs.nearDupDropWithinWatermark(docs, col("text"),
      timestamp_millis(col("ts_ms")), "10 seconds")
    val quality = admitted
      .filter(length(Portable.normText(col("text"))) > 0 &&
        size(Portable.words(col("text"))) >= 3)
      .select(col("doc_id"), col("text"),
        timestamp_millis(col("ts_ms")).as("event_time"))
    val q = graft.streaming.Sinks
      .bucketedFileSink(quality, "event_time", dir, ckpt, format = "csv")
      .start()
    try {
      in.addData(
        (1000L, "d1", "spark query runs fast"),
        (2000L, "d2", "fast spark runs query"), // near-dup of d1 → dropped
        (3000L, "d3", ""),                      // empty → admitted, quality-dropped
        (4000L, "d4", "short one"),             // 2 tokens → quality-dropped
        (5000L, "d5", "windows close when watermarks pass"))
      q.processAllAvailable()
      // a second micro-batch lands in the next hour's bucket
      in.addData((3606000L, "d6", "a second hour bucket document"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read
      .schema("doc_id STRING, text STRING, event_time TIMESTAMP")
      .csv(dir)
    val rows = out.select("doc_id", "bucket").as[(String, String)]
      .collect().toSet
    assert(rows == Set(
      ("d1", "1970-01-01--00"),
      ("d5", "1970-01-01--00"),
      ("d6", "1970-01-01--01")))
  }

  test("keyValueWriter streams every record through a per-partition client lifecycle") {
    reset()
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val q = in.toDF().toDF("k", "v")
      .writeStream
      .foreach(Sinks.keyValueWriter(() => new SinksSpec.RecordingClient,
        "k", "v"))
      .start()
    try {
      in.addData(("x", 1), ("y", 2))
      q.processAllAvailable()
      in.addData(("x", 3))
      q.processAllAvailable()
    } finally q.stop()
    // last write wins per key; every record reached the endpoint
    assert(store.get("x") == "3" && store.get("y") == "2")
    assert(upserts.get() == 3)
    // RichSinkFunction-style lifecycle: every opened client closed
    assert(opens.get() > 0 && opens.get() == closes.get())
  }
}
