package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by module; every entry here has either a DuckDB
  * oracle in `oracleSql` (hash-checked) or a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hot-items analog of `topn/HotItems.java`: sliding-window top-N
    * users by event count.
    */
  def entry(spark: SparkSession): DataFrame =
    EventOps.hotUsers(Tables.events(spark, "/root/testdata/sf0.001"), 3)

  private val modules: Seq[QueryModule] = Seq(
    Relational, EventOps, TextOps, Dedup, Similarity, Multimodal, Skew,
    Corpus, Analysis)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap.map { case (k, v) => k -> v.trim }
}

/** Implemented query modules expose driver bindings through this. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
