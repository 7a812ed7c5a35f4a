package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All loaders are plain parquet scans so
  * Catalyst predicate pushdown / column pruning apply end-to-end.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    spark.read.parquet(path(dir, name))
  }

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** events.parquet has shipped with two physical types for `ts`
    * across driver generations: TIMESTAMP(NANOS) (read as a
    * nanosecond-epoch long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
    * (read as TimestampNTZ). Either way the loader exposes the same
    * two columns: the exact integer `ts_ns` (lossless, matches
    * DuckDB's `epoch_ns(ts)` — every oracle-checked query keys on it)
    * and a microsecond TimestampType `ts` for Spark's native window
    * functions. The session timezone is pinned UTC, so the NTZ→TZ
    * cast relabels the same microsecond value.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    val cooked = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
    cooked.select("event_id", "ts_ns", "user_id", "event_type", "value",
      "props", "ts")
  }
}
