package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffling a fact table ONCE into N
  * buckets on its join key makes every subsequent equi-join or
  * aggregation on that key exchange-free — the biggest single lever
  * for a 100 TB fact table that is joined repeatedly (the shuffle is
  * paid at write time, not per query).
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets so
    * sort-merge join needs no sort either). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
