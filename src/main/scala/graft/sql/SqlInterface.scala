package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** SQL front-end (the reference's `flink-sql` module surface:
  * `flink-sql/sql/ddl/Time.md` — tables with event-time attributes and
  * windowed SQL over them). Registering the test tables as temp views
  * makes every engine capability reachable through `spark.sql`; the
  * Time.md examples map to Spark SQL's window()/session_window() table
  * functions. Watermark DDL (`WATERMARK FOR ts AS ts - INTERVAL ...`)
  * maps to `withWatermark` on the streaming read — declared here at
  * registration time for streaming views.
  */
object SqlInterface {

  /** Register every test table as a temp view; `events` gets the
    * derived event-time columns (the Time.md computed-column pattern:
    * `ts AS TO_TIMESTAMP(...)`). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")) {
      spark.read.parquet(Tables.path(dir, t)).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** `Time.md:36-38`: COUNT(DISTINCT user) per 10-minute tumbling
    * event-time window, as SQL text. */
  def windowedCountDistinct(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT unix_timestamp(window.start) AS w_start,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY window(ts, '10 minutes')""")

  /** Session-window SQL (`Time.md` session analog). */
  def sessionCounts(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT user_id, unix_timestamp(session_window.start) AS sess_start,
             count(*) AS n_events
      FROM events
      GROUP BY session_window(ts, '30 minutes'), user_id""")
}
