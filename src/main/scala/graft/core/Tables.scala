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

  /** events.parquet carries TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` the `ts` column reads
    * as a nanosecond-epoch long. We keep that exact long as `ts_ns`
    * (lossless, matches DuckDB's epoch_ns) and add a microsecond
    * TimestampType `ts` for Spark's native window functions.
    */
  def events(s: SparkSession, d: String): DataFrame =
    read(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
