package graft

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sinks

/** K2/K3 — streaming file sinks round-tripped: write a stream to a
  * time-bucketed csv dir (`filesystem/FsRowFormatSink.java:44-66`) and
  * an lz4 ORC dir (`FsBulkFormatSink.java:46-58`), read both back and
  * assert contents, bucket dirs, and the rolling knob.
  */
class FileSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // 10:xx and 11:xx on 2020-06-01 UTC → two hour buckets
  private val h10 = Timestamp.valueOf("2020-06-01 10:00:00").getTime
  private val h11 = Timestamp.valueOf("2020-06-01 11:00:00").getTime

  test("csv sink writes hour-bucketed dirs, rolls files, reads back") {
    implicit val sqlCtx = spark.sqlContext
    val (out, cp) = (tmp("k2_out"), tmp("k2_cp"))
    val in = MemoryStream[(Long, String)]
    val df = in.toDS().toDF("ts_ms", "word")
      .select(timestamp_millis(col("ts_ms")).as("ts"), col("word"))
    val q = Sinks.bucketedFileSink(df, "ts", out, cp,
      maxRecordsPerFile = 2).start()
    try {
      in.addData((h10, "a"), (h10 + 1000, "b"), (h10 + 2000, "c"),
        (h11, "d"))
      q.processAllAvailable()
    } finally q.stop()

    // exactly-once marker: the sink's commit log tracks finished files
    assert(new File(out, "_spark_metadata").exists())
    val buckets = new File(out).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).sorted
    assert(buckets.toSeq == Seq("bucket=2020-06-01--10",
      "bucket=2020-06-01--11"))
    // rolling: 3 rows in the 10h bucket with maxRecordsPerFile=2 → ≥2 files
    val files10 = new File(out, "bucket=2020-06-01--10").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files10.length >= 2, s"expected rolled files, got ${files10.length}")

    val back = spark.read.schema("ts TIMESTAMP, word STRING").csv(out)
      .select(col("word"), col("ts"), col("bucket").cast("string"))
      .as[(String, Timestamp, String)].collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq("a", "b", "c", "d"))
    assert(back.map(_._2.getTime).toSeq ==
      Seq(h10, h10 + 1000, h10 + 2000, h11))
    assert(back.map(_._3).toSeq == Seq.fill(3)("2020-06-01--10") :+
      "2020-06-01--11")
  }

  test("orc sink writes lz4 files and reads back") {
    implicit val sqlCtx = spark.sqlContext
    val (out, cp) = (tmp("k3_out"), tmp("k3_cp"))
    val in = MemoryStream[(Long, String)]
    val q = Sinks.orcSink(in.toDS().toDF("n", "s"), out, cp).start()
    try {
      in.addData((1L, "x"), (2L, "y"), (3L, "z"))
      q.processAllAvailable()
    } finally q.stop()

    val orcFiles = new File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".orc"))
    assert(orcFiles.nonEmpty)
    assert(orcFiles.forall(_.contains("lz4")),
      s"not lz4-compressed: ${orcFiles.toSeq}")
    val back = spark.read.orc(out).as[(Long, String)].collect().sorted
    assert(back.toSeq == Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }
}
