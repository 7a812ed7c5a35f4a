package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Portable._

/** Skew-handling patterns for hot keys. `events.event_type` has only
  * 5 distinct values — the classic pathological group key where one
  * reducer would receive 20% of a 100 TB stream. The salted two-stage
  * aggregation splits every hot key across `saltBuckets` reducers for
  * the heavy first stage; the second stage combines `saltBuckets`
  * tiny partials per key. Results are identical to the direct
  * aggregation (verified by the oracle), only the shuffle layout
  * changes. (AQE's skew-join splitting handles the join case; salting
  * is the aggregation-side tool.)
  */
object Skew extends graft.QueryModule {

  def saltedAgg(events: DataFrame, saltBuckets: Int): DataFrame =
    events
      .withColumn("salt", pmod(col("event_id"), lit(saltBuckets)))
      .groupBy(col("event_type"), col("salt"))      // stage 1: heavy, spread
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pt"))
      .groupBy(col("event_type"))                   // stage 2: 5 × saltBuckets rows
      .agg(sum(col("pn")).as("n"),
        sum(col("pt")).cast("double").as("total"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_salted_agg" -> ((s, d) => saltedAgg(Tables.events(s, d), 16))
  )

  // identical to the UNSALTED direct aggregation — that's the point
  def oracle: Map[String, String] = Map(
    "q37_salted_agg" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type"""
  )
}
